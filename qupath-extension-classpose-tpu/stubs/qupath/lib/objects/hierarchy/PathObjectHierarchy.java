package qupath.lib.objects.hierarchy;

import java.util.Collection;
import qupath.lib.objects.PathObject;

public class PathObjectHierarchy {
    public static class SelectionModel {
        public Collection<PathObject> getSelectedObjects() { throw new UnsupportedOperationException("stub"); }
    }
    public SelectionModel getSelectionModel() { throw new UnsupportedOperationException("stub"); }
    public void addObjects(Collection<? extends PathObject> objects) { throw new UnsupportedOperationException("stub"); }
    public void fireHierarchyChangedEvent(Object source) { throw new UnsupportedOperationException("stub"); }
}
