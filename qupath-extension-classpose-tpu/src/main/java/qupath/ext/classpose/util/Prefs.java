package qupath.ext.classpose.util;

import java.util.prefs.Preferences;

/** Persistent preferences: python path, model dirs, last-used options. */
public final class Prefs {

    private static final Preferences PREFS =
            Preferences.userRoot().node("qupath.ext.classpose.tpu");

    private Prefs() {}

    public static String getPythonPath() {
        return PREFS.get("pythonPath", "python");
    }

    public static void setPythonPath(String path) {
        PREFS.put("pythonPath", path);
    }

    public static String get(String key, String fallback) {
        return PREFS.get(key, fallback);
    }

    public static void put(String key, String value) {
        PREFS.put(key, value);
    }

    public static boolean getBoolean(String key, boolean fallback) {
        return PREFS.getBoolean(key, fallback);
    }

    public static void putBoolean(String key, boolean value) {
        PREFS.putBoolean(key, value);
    }

    public static int getInt(String key, int fallback) {
        return PREFS.getInt(key, fallback);
    }

    public static void putInt(String key, int value) {
        PREFS.putInt(key, value);
    }
}
