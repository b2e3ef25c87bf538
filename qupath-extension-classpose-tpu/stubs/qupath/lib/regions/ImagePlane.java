package qupath.lib.regions;

public class ImagePlane {
    public static ImagePlane getDefaultPlane() { throw new UnsupportedOperationException("stub"); }
}
