package qupath.lib.images;

import qupath.lib.images.servers.ImageServer;
import qupath.lib.objects.hierarchy.PathObjectHierarchy;

public class ImageData<T> {
    public PathObjectHierarchy getHierarchy() { throw new UnsupportedOperationException("stub"); }
    public ImageServer<T> getServer() { throw new UnsupportedOperationException("stub"); }
}
