package qupath.lib.objects;

import qupath.lib.objects.classes.PathClass;
import qupath.lib.roi.interfaces.ROI;

public class PathObject {
    public boolean isAnnotation() { throw new UnsupportedOperationException("stub"); }
    public ROI getROI() { throw new UnsupportedOperationException("stub"); }
    public PathClass getPathClass() { throw new UnsupportedOperationException("stub"); }
    public void setPathClass(PathClass pathClass) { throw new UnsupportedOperationException("stub"); }
    public void setLocked(boolean locked) { throw new UnsupportedOperationException("stub"); }
}
