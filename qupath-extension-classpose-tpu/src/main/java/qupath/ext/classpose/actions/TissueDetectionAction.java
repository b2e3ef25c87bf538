package qupath.ext.classpose.actions;

import javafx.application.Platform;
import javafx.geometry.Insets;
import javafx.scene.Scene;
import javafx.scene.control.Button;
import javafx.scene.control.Label;
import javafx.scene.control.TextArea;
import javafx.scene.control.TextField;
import javafx.scene.layout.GridPane;
import javafx.stage.Stage;

import java.net.URI;
import java.nio.file.Path;
import java.util.List;

import qupath.ext.classpose.io.GeoJsonImporter;
import qupath.ext.classpose.py.PythonRunner;
import qupath.ext.classpose.util.ImportConventions;
import qupath.ext.classpose.util.Prefs;
import qupath.lib.gui.QuPathGUI;
import qupath.lib.images.ImageData;

/** GrandQC tissue detection only (writes + imports tissue contours). */
public class TissueDetectionAction {

    protected final QuPathGUI qupath;
    protected final TextArea log = new TextArea();

    public TissueDetectionAction(QuPathGUI qupath) {
        this.qupath = qupath;
    }

    protected String module() {
        return "detect_tissue";
    }

    protected String modelPrefKey() {
        return "tissueModel";
    }

    protected String outputFile(String baseName) {
        return ImportConventions.tissueContours(baseName);
    }

    public void run() {
        ImageData<?> imageData = qupath.getImageData();
        if (imageData == null) {
            return;
        }
        Stage stage = new Stage();
        stage.setTitle("Classpose TPU — " + module());
        GridPane grid = new GridPane();
        grid.setHgap(8);
        grid.setVgap(8);
        grid.setPadding(new Insets(12));
        TextField model = new TextField(Prefs.get(modelPrefKey(), ""));
        TextField outputFolder = new TextField(
                Prefs.get("outputFolder", System.getProperty("user.home")));
        TextField pythonPath = new TextField(Prefs.getPythonPath());
        Button runBtn = new Button("Run");
        grid.addRow(0, new Label("Model (.npz)"), model);
        grid.addRow(1, new Label("Output folder"), outputFolder);
        grid.addRow(2, new Label("Python executable"), pythonPath);
        grid.addRow(3, runBtn);
        log.setPrefRowCount(10);
        log.setEditable(false);
        grid.add(log, 0, 4, 2, 1);
        runBtn.setOnAction(e -> new Thread(() -> {
            try {
                Prefs.put(modelPrefKey(), model.getText());
                URI uri = imageData.getServer().getURIs().iterator().next();
                String slidePath = "file".equals(uri.getScheme())
                        ? Path.of(uri).toString() : uri.toString();
                String baseName = ImportConventions.baseName(
                        Path.of(slidePath).getFileName().toString());
                PythonRunner runner = new PythonRunner(
                        pythonPath.getText(), this::appendLog);
                int code = runner.run(module(), List.of(
                        "--slide_path", slidePath,
                        "--model_path", model.getText(),
                        "--output_folder", outputFolder.getText()));
                appendLog("Exited with code " + code);
                if (code == 0) {
                    int n = GeoJsonImporter.importOutputs(imageData,
                            Path.of(outputFolder.getText(),
                                    outputFile(baseName)));
                    appendLog("Imported " + n + " annotations.");
                }
            } catch (Exception ex) {
                appendLog("ERROR: " + ex);
            }
        }).start());
        stage.setScene(new Scene(grid));
        stage.show();
    }

    protected void appendLog(String line) {
        Platform.runLater(() -> log.appendText(line + "\n"));
    }
}
