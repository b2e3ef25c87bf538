package qupath.lib.geom;

public class Point2 {
    public Point2(double x, double y) {}
    public double getX() { throw new UnsupportedOperationException("stub"); }
    public double getY() { throw new UnsupportedOperationException("stub"); }
}
