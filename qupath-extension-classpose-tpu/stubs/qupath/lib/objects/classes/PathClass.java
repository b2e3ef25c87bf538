package qupath.lib.objects.classes;

public class PathClass {
    public String getName() { throw new UnsupportedOperationException("stub"); }
    public static PathClass fromString(String name, Integer rgb) { throw new UnsupportedOperationException("stub"); }
    public static PathClass fromString(String name) { throw new UnsupportedOperationException("stub"); }
}
