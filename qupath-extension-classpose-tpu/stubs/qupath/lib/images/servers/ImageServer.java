package qupath.lib.images.servers;

import java.net.URI;
import java.util.Collection;

public class ImageServer<T> {
    public Collection<URI> getURIs() { throw new UnsupportedOperationException("stub"); }
}
