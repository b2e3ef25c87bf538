package qupath.lib.roi;

import java.util.List;
import qupath.lib.geom.Point2;
import qupath.lib.regions.ImagePlane;
import qupath.lib.roi.interfaces.ROI;

public final class ROIs {
    private ROIs() {}
    public static ROI createPolygonROI(List<Point2> points, ImagePlane plane) { throw new UnsupportedOperationException("stub"); }
    public static ROI createPointsROI(double x, double y, ImagePlane plane) { throw new UnsupportedOperationException("stub"); }
}
