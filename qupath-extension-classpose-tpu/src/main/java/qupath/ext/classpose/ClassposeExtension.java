package qupath.ext.classpose;

import javafx.scene.control.Menu;
import javafx.scene.control.MenuItem;
import qupath.ext.classpose.actions.ArtefactDetectionAction;
import qupath.ext.classpose.actions.PredictWSIAction;
import qupath.ext.classpose.actions.TissueDetectionAction;
import qupath.lib.gui.QuPathGUI;
import qupath.lib.gui.extensions.QuPathExtension;

/**
 * Classpose-TPU QuPath extension: registers menu actions that drive the
 * classpose_tpu Python CLI on the open slide and import the resulting
 * GeoJSON annotations.
 *
 * <p>The CLI contract matches the original classpose extension: the module
 * {@code classpose_tpu.entrypoints.predict_wsi} is invoked with the same
 * flag names, and outputs follow the {@code {base}_cell_contours.geojson}
 * filename conventions.
 */
public class ClassposeExtension implements QuPathExtension {

    @Override
    public void installExtension(QuPathGUI qupath) {
        Menu menu = qupath.getMenu("Extensions>Classpose TPU", true);

        MenuItem predict = new MenuItem("Predict WSI...");
        predict.setOnAction(e -> new PredictWSIAction(qupath).run());
        menu.getItems().add(predict);

        MenuItem tissue = new MenuItem("Tissue detection...");
        tissue.setOnAction(e -> new TissueDetectionAction(qupath).run());
        menu.getItems().add(tissue);

        MenuItem artefacts = new MenuItem("Artefact detection...");
        artefacts.setOnAction(e -> new ArtefactDetectionAction(qupath).run());
        menu.getItems().add(artefacts);
    }

    @Override
    public String getName() {
        return "Classpose TPU";
    }

    @Override
    public String getDescription() {
        return "Whole-slide cell segmentation and phenotyping via the "
                + "TPU-native classpose_tpu pipeline";
    }
}
