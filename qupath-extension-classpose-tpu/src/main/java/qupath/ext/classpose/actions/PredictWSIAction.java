package qupath.ext.classpose.actions;

import com.google.gson.JsonArray;
import com.google.gson.JsonObject;

import javafx.application.Platform;
import javafx.geometry.Insets;
import javafx.scene.Scene;
import javafx.scene.control.Accordion;
import javafx.scene.control.Alert;
import javafx.scene.control.Button;
import javafx.scene.control.ButtonType;
import javafx.scene.control.CheckBox;
import javafx.scene.control.ComboBox;
import javafx.scene.control.Label;
import javafx.scene.control.TextArea;
import javafx.scene.control.TextField;
import javafx.scene.control.TitledPane;
import javafx.scene.layout.GridPane;
import javafx.scene.layout.Priority;
import javafx.scene.layout.VBox;
import javafx.stage.Stage;

import java.io.BufferedWriter;
import java.io.File;
import java.io.FileWriter;
import java.io.IOException;
import java.net.URI;
import java.nio.file.Files;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;
import java.util.function.Consumer;

import qupath.ext.classpose.io.GeoJsonImporter;
import qupath.ext.classpose.py.PythonRunner;
import qupath.ext.classpose.util.ImportConventions;
import qupath.ext.classpose.util.Prefs;
import qupath.lib.gui.QuPathGUI;
import qupath.lib.images.ImageData;
import qupath.lib.objects.PathObject;

/**
 * "Predict WSI..." action: full option dialog → CLI invocation with live
 * log window and cancellation → timestamp-gated GeoJSON import.
 *
 * <p>Flag assembly preserves the original extension's CLI contract
 * (reference ClassposePredictWSIAction.java:380-438): the
 * {@code predict_wsi} module receives --model_config, --slide_path,
 * --tissue_detection_model_path / --artefact_detection_model_path (fixed
 * paths under the extension's models directory unless overridden),
 * --output_folder, --output_type, --roi_geojson (the user's selected
 * annotations, serialized by this action), --tta, --precision, --device,
 * --batch_size, --tile_size, --overlap and --min_area.
 *
 * <p>All dialog options are cached across sessions via
 * {@link qupath.ext.classpose.util.Prefs}. Validation mirrors the
 * original: required fields, and CSV/SpatialData outputs require tissue
 * detection.
 */
public class PredictWSIAction {

    private static final String LOCAL_OPTION = "local model (specify below)";

    private final QuPathGUI qupath;
    private PythonRunner runner;

    public PredictWSIAction(QuPathGUI qupath) {
        this.qupath = qupath;
    }

    public void run() {
        ImageData<?> imageData = qupath.getImageData();
        if (imageData == null) {
            alert("Open an image before running prediction.");
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
                "conic", "consep", "glysac", "monusac", "nucls", "puma",
                LOCAL_OPTION);
        modelConfig.setValue(Prefs.get("modelConfig", "conic"));
        TextField localModel = new TextField(Prefs.get("localModel", ""));
        localModel.setDisable(!LOCAL_OPTION.equals(modelConfig.getValue()));
        final boolean[] nuclsWarned = {false};
        modelConfig.valueProperty().addListener((obs, ov, nv) -> {
            localModel.setDisable(!LOCAL_OPTION.equals(nv));
            if (!nuclsWarned[0] && "nucls".equals(nv)) {
                nuclsWarned[0] = true;
                Alert a = new Alert(Alert.AlertType.WARNING,
                        "The 'nucls' preset may produce lower-quality "
                        + "results than other models; consider another "
                        + "preset or a local model if results are "
                        + "unsatisfactory.", ButtonType.OK);
                a.setHeaderText("'nucls' performance may be subpar");
                a.showAndWait();
            }
        });

        TextField outputFolder = new TextField(
                Prefs.get("outputFolder", System.getProperty("user.home")));
        TextField pythonPath = new TextField(Prefs.getPythonPath());
        CheckBox tissue = new CheckBox("Tissue detection");
        tissue.setSelected(Prefs.getBoolean("tissue", true));
        CheckBox artefacts = new CheckBox("Artefact filtering");
        artefacts.setSelected(Prefs.getBoolean("artefacts", false));
        CheckBox tta = new CheckBox("Test-time augmentation");
        tta.setSelected(Prefs.getBoolean("tta", false));
        CheckBox useRoi = new CheckBox("Restrict to selected annotations");
        useRoi.setSelected(Prefs.getBoolean("roi", false));
        CheckBox csvOut = new CheckBox("Density CSV");
        csvOut.setSelected(Prefs.getBoolean("output_csv", false));
        CheckBox spatialOut = new CheckBox("SpatialData store");
        spatialOut.setSelected(Prefs.getBoolean("output_spatialdata", false));
        ComboBox<String> precision = new ComboBox<>();
        precision.getItems().addAll("bf16", "fp16", "fp32");
        precision.setValue(Prefs.get("precision", "bf16"));
        ComboBox<String> deviceKind = new ComboBox<>();
        deviceKind.getItems().addAll("default", "TPU", "CPU", "GPU");
        deviceKind.setValue(Prefs.get("deviceKind", "default"));
        TextField deviceIds = new TextField(Prefs.get("deviceIds", ""));
        deviceIds.setPromptText("Comma-separated device ids, e.g. 0 or 0,1");

        // CSV/SpatialData require tissue detection (density denominators)
        csvOut.setDisable(!tissue.isSelected());
        spatialOut.setDisable(!tissue.isSelected());
        tissue.selectedProperty().addListener((obs, ov, nv) -> {
            csvOut.setDisable(!nv);
            spatialOut.setDisable(!nv);
        });

        // Advanced pane
        TextField tissueModel = new TextField(Prefs.get("tissueModel", ""));
        tissueModel.setPromptText("default: <extensions>/classpose-tpu-models/");
        TextField artefactModel = new TextField(Prefs.get("artefactModel", ""));
        artefactModel.setPromptText("default: <extensions>/classpose-tpu-models/");
        TextField batchSize = new TextField(Prefs.get("batchSize", "8"));
        TextField tileSize = new TextField(Prefs.get("tileSize", "1024"));
        TextField overlap = new TextField(Prefs.get("overlap", "64"));
        TextField minArea = new TextField(Prefs.get("minArea", "0"));
        TextField tileBatch = new TextField(Prefs.get("tileBatch", ""));
        tileBatch.setPromptText("default: max(4, n_devices)");

        GridPane adv = new GridPane();
        adv.setHgap(8);
        adv.setVgap(6);
        int a = 0;
        adv.addRow(a++, new Label("Tissue model override"), tissueModel);
        adv.addRow(a++, new Label("Artefact model override"), artefactModel);
        adv.addRow(a++, new Label("Batch size"), batchSize);
        adv.addRow(a++, new Label("Tile size"), tileSize);
        adv.addRow(a++, new Label("Overlap"), overlap);
        adv.addRow(a++, new Label("Min tissue area (µm²)"), minArea);
        adv.addRow(a++, new Label("Tile batch"), tileBatch);
        TitledPane advPane = new TitledPane("Advanced options", adv);
        advPane.setExpanded(false);
        advPane.setAnimated(false);
        Accordion accordion = new Accordion(advPane);
        advPane.expandedProperty().addListener(
                (o, was, isNow) -> Platform.runLater(stage::sizeToScene));

        int r = 0;
        grid.addRow(r++, new Label("Model *"), modelConfig);
        grid.addRow(r++, new Label("Local model"), localModel);
        grid.addRow(r++, new Label("Output folder *"), outputFolder);
        grid.addRow(r++, new Label("Python executable"), pythonPath);
        grid.addRow(r++, new Label("Precision"), precision);
        grid.addRow(r++, new Label("Device"), deviceKind);
        grid.addRow(r++, new Label("Device ids"), deviceIds);
        grid.addRow(r++, tta, useRoi);
        grid.addRow(r++, tissue, artefacts);
        grid.addRow(r++, csvOut, spatialOut);
        grid.add(accordion, 0, r++, 2, 1);

        Button runBtn = new Button("Run");
        Button closeBtn = new Button("Cancel");
        runBtn.setDefaultButton(true);
        closeBtn.setCancelButton(true);
        closeBtn.setOnAction(e -> stage.close());
        grid.addRow(r++, runBtn, closeBtn);

        runBtn.setOnAction(e -> {
            boolean useLocal = LOCAL_OPTION.equals(modelConfig.getValue());
            if (outputFolder.getText().isBlank()
                    || (useLocal && localModel.getText().isBlank())) {
                alert("Please fill all required fields.");
                return;
            }
            if ((csvOut.isSelected() || spatialOut.isSelected())
                    && !tissue.isSelected()) {
                alert("CSV and SpatialData output require tissue detection "
                        + "to be enabled.");
                return;
            }
            String slidePath = slidePath(imageData);
            if (slidePath == null) {
                alert("Could not resolve current slide path. Please open a "
                        + "local WSI.");
                return;
            }
            String modelArg = useLocal
                    ? localModel.getText().trim()
                    : modelConfig.getValue();

            cachePrefs(modelConfig, localModel, outputFolder, pythonPath,
                    tissue, artefacts, tta, useRoi, csvOut, spatialOut,
                    precision, deviceKind, deviceIds, tissueModel,
                    artefactModel, batchSize, tileSize, overlap, minArea,
                    tileBatch);

            List<String> args;
            try {
                args = buildArgs(imageData, modelArg, slidePath,
                        outputFolder.getText().trim(),
                        tissue.isSelected(), artefacts.isSelected(),
                        tissueModel.getText().trim(),
                        artefactModel.getText().trim(),
                        csvOut.isSelected(), spatialOut.isSelected(),
                        useRoi.isSelected(), tta.isSelected(),
                        precision.getValue(),
                        deviceString(deviceKind.getValue(),
                                deviceIds.getText()),
                        batchSize.getText().trim(), tileSize.getText().trim(),
                        overlap.getText().trim(), minArea.getText().trim(),
                        tileBatch.getText().trim());
            } catch (IllegalStateException ex) {
                alert(ex.getMessage());
                return;
            } catch (IOException ex) {
                alert("Failed to export ROI GeoJSON: " + ex.getMessage());
                return;
            }
            stage.close();
            runWithLogWindow(imageData, pythonPath.getText().trim(),
                    slidePath, outputFolder.getText().trim(), args);
        });

        stage.setScene(new Scene(grid));
        stage.show();
        Platform.runLater(stage::sizeToScene);
    }

    /** Map the device dropdown + ids onto the CLI --device string
     * (tpu / tpu:0,1 / cpu / cuda:...; null = let the CLI default). */
    static String deviceString(String kind, String ids) {
        if (kind == null || "default".equals(kind))
            return null;
        String base = switch (kind) {
            case "TPU" -> "tpu";
            case "CPU" -> "cpu";
            case "GPU" -> "cuda";
            default -> null;
        };
        if (base == null)
            return null;
        String trimmed = ids == null ? "" : ids.trim();
        return trimmed.isEmpty() ? base : base + ":" + trimmed;
    }

    /** Fixed model paths under the QuPath extensions directory, as the
     * original extension does (ClassposePredictWSIAction.java:371-377).
     * The extensions dir isn't exposed uniformly across QuPath versions,
     * so this resolves the conventional ~/QuPath/extensions location and
     * can always be overridden per-model in the Advanced pane. */
    private File modelsDir() {
        File base = new File(System.getProperty("user.home"), "QuPath");
        return new File(new File(base, "extensions"), "classpose-tpu-models");
    }

    List<String> buildArgs(
            ImageData<?> imageData, String modelArg, String slidePath,
            String outputFolder, boolean tissue, boolean artefacts,
            String tissueOverride, String artefactOverride,
            boolean csvOut, boolean spatialOut, boolean useRoi, boolean tta,
            String precision, String device, String batchSize,
            String tileSize, String overlap, String minArea,
            String tileBatch) throws IOException {
        File modelsDir = modelsDir();
        modelsDir.mkdirs();
        String tissuePath = !tissueOverride.isBlank() ? tissueOverride
                : new File(modelsDir, "grandqc_tissue_model.npz")
                        .getAbsolutePath();
        String artefactPath = !artefactOverride.isBlank() ? artefactOverride
                : new File(modelsDir, "grandqc_artefact_model.npz")
                        .getAbsolutePath();

        List<String> args = new ArrayList<>(List.of(
                "--model_config", modelArg,
                "--slide_path", slidePath,
                "--output_folder", outputFolder));
        if (tissue) {
            args.add("--tissue_detection_model_path");
            args.add(tissuePath);
        }
        if (artefacts) {
            args.add("--artefact_detection_model_path");
            args.add(artefactPath);
            args.add("--filter_artefacts");
        }
        if (csvOut || spatialOut) {
            args.add("--output_type");
            if (csvOut)
                args.add("csv");
            if (spatialOut)
                args.add("spatialdata");
        }
        if (useRoi) {
            String baseName = ImportConventions.baseName(
                    Path.of(slidePath).getFileName().toString());
            Path roiFile = Path.of(outputFolder,
                    ImportConventions.roi(baseName));
            Files.createDirectories(roiFile.getParent());
            if (!serializeSelectedAnnotations(imageData, roiFile))
                throw new IllegalStateException("ROI mode enabled but no "
                        + "valid polygon annotations are selected.");
            args.add("--roi_geojson");
            args.add(roiFile.toString());
        }
        if (tta)
            args.add("--tta");
        args.add("--precision");
        args.add(precision);
        if (device != null) {
            args.add("--device");
            args.add(device);
        }
        args.add("--batch_size");
        args.add(batchSize);
        args.add("--tile_size");
        args.add(tileSize);
        args.add("--overlap");
        args.add(overlap);
        args.add("--min_area");
        args.add(minArea);
        if (!tileBatch.isBlank()) {
            args.add("--tile_batch");
            args.add(tileBatch);
        }
        return args;
    }

    private void cachePrefs(
            ComboBox<String> modelConfig, TextField localModel,
            TextField outputFolder, TextField pythonPath, CheckBox tissue,
            CheckBox artefacts, CheckBox tta, CheckBox useRoi,
            CheckBox csvOut, CheckBox spatialOut,
            ComboBox<String> precision, ComboBox<String> deviceKind,
            TextField deviceIds, TextField tissueModel,
            TextField artefactModel, TextField batchSize, TextField tileSize,
            TextField overlap, TextField minArea, TextField tileBatch) {
        Prefs.setPythonPath(pythonPath.getText());
        Prefs.put("modelConfig", modelConfig.getValue());
        Prefs.put("localModel", localModel.getText());
        Prefs.put("outputFolder", outputFolder.getText());
        Prefs.putBoolean("tissue", tissue.isSelected());
        Prefs.putBoolean("artefacts", artefacts.isSelected());
        Prefs.putBoolean("tta", tta.isSelected());
        Prefs.putBoolean("roi", useRoi.isSelected());
        Prefs.putBoolean("output_csv", csvOut.isSelected());
        Prefs.putBoolean("output_spatialdata", spatialOut.isSelected());
        Prefs.put("precision", precision.getValue());
        Prefs.put("deviceKind", deviceKind.getValue());
        Prefs.put("deviceIds", deviceIds.getText());
        Prefs.put("tissueModel", tissueModel.getText());
        Prefs.put("artefactModel", artefactModel.getText());
        Prefs.put("batchSize", batchSize.getText());
        Prefs.put("tileSize", tileSize.getText());
        Prefs.put("overlap", overlap.getText());
        Prefs.put("minArea", minArea.getText());
        Prefs.put("tileBatch", tileBatch.getText());
    }

    /** Live log window with cancel; on success, import outputs created
     * after launch (timestamp-gated, like the original extension). */
    private void runWithLogWindow(
            ImageData<?> imageData, String pythonPath, String slidePath,
            String outputFolder, List<String> args) {
        Stage logStage = new Stage();
        logStage.setTitle("Classpose TPU — Inference Log");
        TextArea ta = new TextArea();
        ta.setEditable(false);
        ta.setWrapText(false);
        Button btnCancel = new Button("Cancel");
        VBox vbox = new VBox(ta, btnCancel);
        VBox.setVgrow(ta, Priority.ALWAYS);
        logStage.setScene(new Scene(vbox, 900, 500));
        logStage.show();

        File logFile = new File(outputFolder, "classpose_predict.log");
        final BufferedWriter[] writerRef = new BufferedWriter[1];
        try {
            new File(outputFolder).mkdirs();
            writerRef[0] = new BufferedWriter(new FileWriter(logFile, true));
            writerRef[0].write("Command: " + pythonPath
                    + " -m classpose_tpu.entrypoints.predict_wsi "
                    + String.join(" ", args) + "\n\n");
            writerRef[0].flush();
        } catch (IOException ignored) {
        }

        Consumer<String> append = line -> {
            Platform.runLater(() -> ta.appendText(line + "\n"));
            if (writerRef[0] != null) {
                try {
                    writerRef[0].write(line + "\n");
                } catch (IOException ignored) {
                }
            }
        };
        Consumer<String> logOut = line -> append.accept("[OUT] " + line);
        Consumer<String> logErr = line -> append.accept("[ERR] " + line);

        long startTs = System.currentTimeMillis();
        runner = new PythonRunner(pythonPath);
        btnCancel.setOnAction(ev -> {
            runner.cancel();
            btnCancel.setDisable(true);
            append.accept("[INFO] Cancel requested by user.");
        });

        Thread th = new Thread(() -> {
            int code;
            try {
                Process p = runner.start("predict_wsi", args,
                        new File(outputFolder), null, logOut, logErr);
                code = p.waitFor();
            } catch (Exception ex) {
                append.accept("[ERR] " + ex);
                code = -1;
            }
            try {
                if (writerRef[0] != null) {
                    writerRef[0].flush();
                    writerRef[0].close();
                }
            } catch (IOException ignored) {
            }
            final int exitCode = code;
            Platform.runLater(() -> {
                if (exitCode != 0) {
                    alert("Prediction failed (exit " + exitCode
                            + "). See log: " + logFile.getAbsolutePath());
                    return;
                }
                logStage.close();
                importOutputs(imageData, slidePath, outputFolder, startTs);
            });
        }, "ClassposePredictWSI");
        th.setDaemon(true);
        th.start();
    }

    private void importOutputs(ImageData<?> imageData, String slidePath,
                               String outputFolder, long startTs) {
        try {
            String baseName = ImportConventions.baseName(
                    Path.of(slidePath).getFileName().toString());
            Path out = Path.of(outputFolder);
            List<Path> fresh = new ArrayList<>();
            for (String name : new String[] {
                    ImportConventions.cellContours(baseName),
                    ImportConventions.tissueContours(baseName),
                    ImportConventions.artefactContours(baseName)}) {
                Path f = out.resolve(name);
                // only import files generated by THIS run
                if (Files.exists(f)
                        && f.toFile().lastModified() >= startTs)
                    fresh.add(f);
            }
            int n = GeoJsonImporter.importOutputs(
                    imageData, fresh.toArray(new Path[0]));
            Alert ok = new Alert(Alert.AlertType.INFORMATION,
                    "Prediction completed; imported " + n + " annotations.",
                    ButtonType.OK);
            ok.showAndWait();
        } catch (Exception ex) {
            alert("Completed but failed to import results: "
                    + ex.getMessage());
        }
    }

    private String slidePath(ImageData<?> imageData) {
        try {
            var uris = imageData.getServer().getURIs();
            URI uri = uris.iterator().next();
            return "file".equals(uri.getScheme())
                    ? Path.of(uri).toString() : uri.toString();
        } catch (Exception ex) {
            return null;
        }
    }

    /** Serialize the selected annotations to {base}_roi.geojson; returns
     * false when no valid polygon annotation is selected. */
    static boolean serializeSelectedAnnotations(
            ImageData<?> imageData, Path file) throws IOException {
        JsonArray features = new JsonArray();
        for (PathObject obj : imageData.getHierarchy()
                .getSelectionModel().getSelectedObjects()) {
            if (!obj.isAnnotation())
                continue;
            var roi = obj.getROI();
            if (roi == null)
                continue;
            JsonArray ring = new JsonArray();
            for (var p : roi.getAllPoints()) {
                JsonArray xy = new JsonArray();
                xy.add(p.getX());
                xy.add(p.getY());
                ring.add(xy);
            }
            if (ring.size() < 3)
                continue;
            // close the ring
            JsonArray first = ring.get(0).getAsJsonArray();
            JsonArray xy0 = new JsonArray();
            xy0.add(first.get(0).getAsDouble());
            xy0.add(first.get(1).getAsDouble());
            ring.add(xy0);
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
        if (features.size() == 0)
            return false;
        JsonObject fc = new JsonObject();
        fc.addProperty("type", "FeatureCollection");
        fc.add("features", features);
        Files.writeString(file, fc.toString());
        return true;
    }

    private void alert(String message) {
        Alert a = new Alert(Alert.AlertType.WARNING, message, ButtonType.OK);
        a.showAndWait();
    }
}
