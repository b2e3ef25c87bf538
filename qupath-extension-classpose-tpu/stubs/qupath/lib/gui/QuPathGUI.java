// Compile-only stub of the QuPath API surface this extension uses.
// Never shipped: the real classes come from qupath-gui-fx at runtime.
package qupath.lib.gui;

import javafx.scene.control.Menu;
import qupath.lib.images.ImageData;

public class QuPathGUI {
    public ImageData<?> getImageData() { throw new UnsupportedOperationException("stub"); }
    public Menu getMenu(String name, boolean create) { throw new UnsupportedOperationException("stub"); }
}
