package qupath.ext.classpose.actions;

import com.google.gson.JsonArray;
import com.google.gson.JsonObject;

import javafx.application.Platform;
import javafx.geometry.Insets;
import javafx.scene.Scene;
import javafx.scene.control.Button;
import javafx.scene.control.CheckBox;
import javafx.scene.control.ComboBox;
import javafx.scene.control.Label;
import javafx.scene.control.TextArea;
import javafx.scene.control.TextField;
import javafx.scene.layout.GridPane;
import javafx.stage.Stage;

import java.io.IOException;
import java.net.URI;
import java.nio.file.Files;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;

import qupath.ext.classpose.io.GeoJsonImporter;
import qupath.ext.classpose.py.PythonRunner;
import qupath.ext.classpose.util.ImportConventions;
import qupath.ext.classpose.util.Prefs;
import qupath.lib.gui.QuPathGUI;
import qupath.lib.images.ImageData;
import qupath.lib.objects.PathObject;

/**
 * "Predict WSI..." action: dialog → CLI invocation → GeoJSON import.
 *
 * <p>Flag assembly matches the original extension's contract: the
 * {@code predict_wsi} module receives --model_config, --slide_path,
 * --tissue_detection_model_path / --artefact_detection_model_path,
 * --output_folder, --output_type, --roi_geojson (the user's selected
 * annotations, serialized by this action), --tta, --precision, --device,
 * --batch_size, --tile_size, --overlap and --min_area.
 */
public class PredictWSIAction {

    private final QuPathGUI qupath;
    private final TextArea log = new TextArea();
    private PythonRunner runner;

    public PredictWSIAction(QuPathGUI qupath) {
        this.qupath = qupath;
    }

    public void run() {
        ImageData<?> imageData = qupath.getImageData();
        if (imageData == null) {
            return;
        }
        Stage stage = new Stage();
        stage.setTitle("Classpose TPU — Predict WSI");
        GridPane grid = new GridPane();
        grid.setHgap(8);
        grid.setVgap(8);
        grid.setPadding(new Insets(12));

        ComboBox<String> modelConfig = new ComboBox<>();
        modelConfig.getItems().addAll(
                "conic", "consep", "glysac", "monusac", "nucls", "puma");
        modelConfig.setValue(Prefs.get("modelConfig", "conic"));

        TextField outputFolder = new TextField(
                Prefs.get("outputFolder", System.getProperty("user.home")));
        TextField pythonPath = new TextField(Prefs.getPythonPath());
        TextField tissueModel = new TextField(Prefs.get("tissueModel", ""));
        TextField artefactModel = new TextField(
                Prefs.get("artefactModel", ""));
        TextField batchSize = new TextField(Prefs.get("batchSize", "8"));
        TextField tileSize = new TextField(Prefs.get("tileSize", "1024"));
        TextField overlap = new TextField(Prefs.get("overlap", "64"));
        TextField minArea = new TextField(Prefs.get("minArea", "0"));
        ComboBox<String> precision = new ComboBox<>();
        precision.getItems().addAll("bf16", "fp16", "fp32");
        precision.setValue(Prefs.get("precision", "bf16"));
        TextField device = new TextField(Prefs.get("device", ""));
        CheckBox tta = new CheckBox("Test-time augmentation");
        CheckBox useRoi = new CheckBox("Restrict to selected annotations");
        CheckBox csvOut = new CheckBox("Density CSV");
        CheckBox spatialOut = new CheckBox("SpatialData store");

        int r = 0;
        grid.addRow(r++, new Label("Model config"), modelConfig);
        grid.addRow(r++, new Label("Output folder"), outputFolder);
        grid.addRow(r++, new Label("Python executable"), pythonPath);
        grid.addRow(r++, new Label("Tissue model (.npz)"), tissueModel);
        grid.addRow(r++, new Label("Artefact model (.npz)"), artefactModel);
        grid.addRow(r++, new Label("Batch size"), batchSize);
        grid.addRow(r++, new Label("Tile size"), tileSize);
        grid.addRow(r++, new Label("Overlap"), overlap);
        grid.addRow(r++, new Label("Min tissue area"), minArea);
        grid.addRow(r++, new Label("Precision"), precision);
        grid.addRow(r++, new Label("Device"), device);
        grid.addRow(r++, tta, useRoi);
        grid.addRow(r++, csvOut, spatialOut);

        Button runBtn = new Button("Run");
        Button cancelBtn = new Button("Cancel");
        grid.addRow(r++, runBtn, cancelBtn);
        log.setPrefRowCount(12);
        log.setEditable(false);
        grid.add(log, 0, r, 2, 1);

        runBtn.setOnAction(e -> {
            Prefs.setPythonPath(pythonPath.getText());
            Prefs.put("modelConfig", modelConfig.getValue());
            Prefs.put("outputFolder", outputFolder.getText());
            Prefs.put("tissueModel", tissueModel.getText());
            Prefs.put("artefactModel", artefactModel.getText());
            new Thread(() -> execute(
                    imageData,
                    modelConfig.getValue(),
                    outputFolder.getText(),
                    pythonPath.getText(),
                    tissueModel.getText(),
                    artefactModel.getText(),
                    batchSize.getText(),
                    tileSize.getText(),
                    overlap.getText(),
                    minArea.getText(),
                    precision.getValue(),
                    device.getText(),
                    tta.isSelected(),
                    useRoi.isSelected(),
                    csvOut.isSelected(),
                    spatialOut.isSelected())).start();
        });
        cancelBtn.setOnAction(e -> {
            if (runner != null) {
                runner.cancel();
            }
        });

        stage.setScene(new Scene(grid));
        stage.show();
    }

    private void execute(
            ImageData<?> imageData, String modelConfig, String outputFolder,
            String pythonPath, String tissueModel, String artefactModel,
            String batchSize, String tileSize, String overlap,
            String minArea, String precision, String device, boolean tta,
            boolean useRoi, boolean csvOut, boolean spatialOut) {
        try {
            String slidePath = slidePath(imageData);
            String baseName = ImportConventions.baseName(
                    Path.of(slidePath).getFileName().toString());
            List<String> args = new ArrayList<>(List.of(
                    "--model_config", modelConfig,
                    "--slide_path", slidePath,
                    "--output_folder", outputFolder,
                    "--batch_size", batchSize,
                    "--tile_size", tileSize,
                    "--overlap", overlap,
                    "--min_area", minArea,
                    "--precision", precision));
            if (!device.isBlank()) {
                args.add("--device");
                args.add(device);
            }
            if (tta) {
                args.add("--tta");
            }
            if (!tissueModel.isBlank()) {
                args.add("--tissue_detection_model_path");
                args.add(tissueModel);
            }
            if (!artefactModel.isBlank()) {
                args.add("--artefact_detection_model_path");
                args.add(artefactModel);
            }
            if (csvOut || spatialOut) {
                args.add("--output_type");
                if (csvOut) {
                    args.add("csv");
                }
                if (spatialOut) {
                    args.add("spatialdata");
                }
            }
            if (useRoi) {
                Path roiFile = Path.of(outputFolder,
                        ImportConventions.roi(baseName));
                serializeSelectedAnnotations(imageData, roiFile);
                args.add("--roi_geojson");
                args.add(roiFile.toString());
            }

            runner = new PythonRunner(pythonPath, this::appendLog);
            int code = runner.run("predict_wsi", args);
            appendLog("Exited with code " + code);
            if (code == 0) {
                Path out = Path.of(outputFolder);
                int n = GeoJsonImporter.importOutputs(imageData,
                        out.resolve(ImportConventions.cellContours(baseName)),
                        out.resolve(
                                ImportConventions.tissueContours(baseName)),
                        out.resolve(
                                ImportConventions.artefactContours(baseName)));
                appendLog("Imported " + n + " annotations.");
            }
        } catch (Exception ex) {
            appendLog("ERROR: " + ex);
        }
    }

    private String slidePath(ImageData<?> imageData) {
        var uris = imageData.getServer().getURIs();
        URI uri = uris.iterator().next();
        return "file".equals(uri.getScheme())
                ? Path.of(uri).toString() : uri.toString();
    }

    /** Serialize the selected annotations to {base}_roi.geojson. */
    static void serializeSelectedAnnotations(
            ImageData<?> imageData, Path file) throws IOException {
        JsonArray features = new JsonArray();
        for (PathObject obj : imageData.getHierarchy()
                .getSelectionModel().getSelectedObjects()) {
            var roi = obj.getROI();
            if (roi == null) {
                continue;
            }
            JsonArray ring = new JsonArray();
            for (var p : roi.getAllPoints()) {
                JsonArray xy = new JsonArray();
                xy.add(p.getX());
                xy.add(p.getY());
                ring.add(xy);
            }
            if (ring.size() < 3) {
                continue;
            }
            JsonArray rings = new JsonArray();
            rings.add(ring);
            JsonObject geometry = new JsonObject();
            geometry.addProperty("type", "Polygon");
            geometry.add("coordinates", rings);
            JsonObject props = new JsonObject();
            if (obj.getPathClass() != null) {
                JsonObject cls = new JsonObject();
                cls.addProperty("name", obj.getPathClass().getName());
                props.add("classification", cls);
            }
            JsonObject feature = new JsonObject();
            feature.addProperty("type", "Feature");
            feature.add("geometry", geometry);
            feature.add("properties", props);
            features.add(feature);
        }
        JsonObject fc = new JsonObject();
        fc.addProperty("type", "FeatureCollection");
        fc.add("features", features);
        Files.writeString(file, fc.toString());
    }

    private void appendLog(String line) {
        Platform.runLater(() -> log.appendText(line + "\n"));
    }
}
