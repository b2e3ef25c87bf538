package qupath.ext.classpose.actions;

import qupath.ext.classpose.util.ImportConventions;
import qupath.lib.gui.QuPathGUI;

/** GrandQC artefact detection (writes + imports artefact contours). */
public class ArtefactDetectionAction extends TissueDetectionAction {

    public ArtefactDetectionAction(QuPathGUI qupath) {
        super(qupath);
    }

    @Override
    protected String module() {
        return "detect_artefacts";
    }

    @Override
    protected String modelPrefKey() {
        return "artefactModel";
    }

    @Override
    protected String outputFile(String baseName) {
        return ImportConventions.artefactContours(baseName);
    }
}
