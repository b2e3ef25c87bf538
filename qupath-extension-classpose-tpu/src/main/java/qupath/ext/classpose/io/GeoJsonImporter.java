package qupath.ext.classpose.io;

import com.google.gson.JsonArray;
import com.google.gson.JsonElement;
import com.google.gson.JsonObject;
import com.google.gson.JsonParser;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;

import qupath.lib.geom.Point2;
import qupath.lib.images.ImageData;
import qupath.lib.objects.PathObject;
import qupath.lib.objects.PathObjects;
import qupath.lib.objects.classes.PathClass;
import qupath.lib.regions.ImagePlane;
import qupath.lib.roi.ROIs;
import qupath.lib.roi.interfaces.ROI;

/**
 * Parses the classpose_tpu GeoJSON outputs (Polygon/Point
 * FeatureCollections with classification name + color) into QuPath
 * annotations.
 */
public final class GeoJsonImporter {

    private GeoJsonImporter() {}

    /** Import every output file that exists; returns the count imported. */
    public static int importOutputs(ImageData<?> imageData, Path... files) {
        int n = 0;
        for (Path f : files) {
            if (f != null && Files.exists(f)) {
                try {
                    n += importFile(imageData, f);
                } catch (IOException e) {
                    // log and continue with the remaining files
                    System.err.println("Failed to import " + f + ": " + e);
                }
            }
        }
        imageData.getHierarchy().fireHierarchyChangedEvent(
                GeoJsonImporter.class);
        return n;
    }

    static int importFile(ImageData<?> imageData, Path file)
            throws IOException {
        JsonObject root = JsonParser.parseString(
                Files.readString(file)).getAsJsonObject();
        JsonArray features = root.getAsJsonArray("features");
        if (features == null) {
            return 0;
        }
        List<PathObject> objects = new ArrayList<>();
        for (JsonElement el : features) {
            PathObject obj = parseFeature(el.getAsJsonObject());
            if (obj != null) {
                objects.add(obj);
            }
        }
        imageData.getHierarchy().addObjects(objects);
        return objects.size();
    }

    static PathObject parseFeature(JsonObject feature) {
        JsonObject geometry = feature.getAsJsonObject("geometry");
        if (geometry == null) {
            return null;
        }
        String type = geometry.get("type").getAsString();
        JsonArray coords = geometry.getAsJsonArray("coordinates");
        ROI roi;
        if ("Polygon".equals(type)) {
            JsonArray exterior = coords.get(0).getAsJsonArray();
            List<Point2> points = new ArrayList<>();
            for (JsonElement p : exterior) {
                JsonArray xy = p.getAsJsonArray();
                points.add(new Point2(
                        xy.get(0).getAsDouble(), xy.get(1).getAsDouble()));
            }
            roi = ROIs.createPolygonROI(points, ImagePlane.getDefaultPlane());
        } else if ("Point".equals(type)) {
            roi = ROIs.createPointsROI(
                    coords.get(0).getAsDouble(), coords.get(1).getAsDouble(),
                    ImagePlane.getDefaultPlane());
        } else {
            return null;
        }

        PathObject annotation = PathObjects.createAnnotationObject(roi);
        JsonObject props = feature.getAsJsonObject("properties");
        if (props != null && props.has("classification")) {
            JsonObject cls = props.getAsJsonObject("classification");
            String name = cls.has("name") ? cls.get("name").getAsString()
                    : "cell";
            int rgb = 0x00A884;
            if (cls.has("color")) {
                JsonArray c = cls.getAsJsonArray("color");
                rgb = (c.get(0).getAsInt() << 16)
                        | (c.get(1).getAsInt() << 8)
                        | c.get(2).getAsInt();
            }
            annotation.setPathClass(PathClass.fromString(name, rgb));
        }
        annotation.setLocked(false);
        return annotation;
    }
}
