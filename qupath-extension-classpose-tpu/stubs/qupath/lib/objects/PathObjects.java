package qupath.lib.objects;

import qupath.lib.roi.interfaces.ROI;

public final class PathObjects {
    private PathObjects() {}
    public static PathObject createAnnotationObject(ROI roi) { throw new UnsupportedOperationException("stub"); }
}
