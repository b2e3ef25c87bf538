package qupath.ext.classpose.util;

/**
 * Output filename conventions, mirroring the Python side
 * (classpose_tpu.utils.GEOJSON_OUTPUT_TEMPLATES): the extension resolves
 * output files by the same {base_name}_*.geojson templates the CLI writes.
 */
public final class ImportConventions {

    private ImportConventions() {}

    public static String cellContours(String baseName) {
        return baseName + "_cell_contours.geojson";
    }

    public static String cellCentroids(String baseName) {
        return baseName + "_cell_centroids.geojson";
    }

    public static String tissueContours(String baseName) {
        return baseName + "_tissue_contours.geojson";
    }

    public static String artefactContours(String baseName) {
        return baseName + "_artefact_contours.geojson";
    }

    public static String roi(String baseName) {
        return baseName + "_roi.geojson";
    }

    /** Slide filename without its last extension. */
    public static String baseName(String slideFileName) {
        int dot = slideFileName.lastIndexOf('.');
        return dot > 0 ? slideFileName.substring(0, dot) : slideFileName;
    }
}
