package qupath.ext.classpose.py;

import java.io.BufferedReader;
import java.io.File;
import java.io.IOException;
import java.io.InputStream;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.function.Consumer;

/**
 * Spawns the classpose_tpu CLI as a subprocess with the process-management
 * behavior of the original extension's runner: PATH extension for common
 * user-local install locations, interpreter resolution on the extended
 * PATH, separate stdout/stderr streaming threads, asynchronous start with
 * best-effort kill (destroy, then destroyForcibly), optional working
 * directory and extra environment.
 *
 * <p>Invocation: {@code <python> -m classpose_tpu.entrypoints.<module>
 * <args...>}. The python executable defaults to "python" and can be
 * configured via {@link qupath.ext.classpose.util.Prefs}.
 */
public class PythonRunner {

    private final String pythonExecutable;
    private Process process;

    public PythonRunner(String pythonExecutable) {
        this.pythonExecutable = pythonExecutable == null || pythonExecutable.isBlank()
                ? "python" : pythonExecutable;
    }

    /** Convenience constructor for merged-stream logging. */
    public PythonRunner(String pythonExecutable, Consumer<String> logConsumer) {
        this(pythonExecutable);
        this.mergedConsumer = logConsumer;
    }

    private Consumer<String> mergedConsumer;

    /**
     * Start the process asynchronously; the caller waits/cancels.
     *
     * @param module     module name under classpose_tpu.entrypoints
     * @param args       CLI arguments
     * @param workingDir working directory (may be null)
     * @param env        extra environment variables (may be null)
     * @param onStdout   stdout line consumer (may be null)
     * @param onStderr   stderr line consumer (may be null)
     */
    public Process start(
            final String module,
            final List<String> args,
            final File workingDir,
            final Map<String, String> env,
            final Consumer<String> onStdout,
            final Consumer<String> onStderr
    ) throws IOException {
        final List<String> command = new ArrayList<>();
        command.add(pythonExecutable);
        command.add("-m");
        command.add("classpose_tpu.entrypoints." + module);
        if (args != null)
            command.addAll(args);

        final ProcessBuilder pb = new ProcessBuilder(command);
        if (workingDir != null) {
            if (!workingDir.exists() && !workingDir.mkdirs())
                throw new IOException("Failed to create working directory: "
                        + workingDir.getAbsolutePath());
            if (!workingDir.isDirectory())
                throw new IOException("Working directory is not a directory: "
                        + workingDir.getAbsolutePath());
            pb.directory(workingDir);
        }
        if (env != null)
            pb.environment().putAll(env);

        // Extend PATH with common user-local locations so a python
        // installed via pipx/homebrew/pyenv is found when QuPath was
        // launched from a GUI (empty login-shell PATH).
        String existingPath = pb.environment().getOrDefault("PATH", System.getenv("PATH"));
        String effectivePath = extendPath(existingPath);
        pb.environment().put("PATH", effectivePath);
        // Resolve the interpreter on the extended PATH when it is a bare name
        if (!command.get(0).contains(File.separator)) {
            String resolved = findOnPath(command.get(0), effectivePath);
            if (resolved != null)
                command.set(0, resolved);
        }
        pb.redirectErrorStream(false);

        process = pb.start();
        Thread tOut = new Thread(() -> streamLines(process.getInputStream(), onStdout), "classpose-stdout");
        Thread tErr = new Thread(() -> streamLines(process.getErrorStream(), onStderr), "classpose-stderr");
        tOut.setDaemon(true);
        tErr.setDaemon(true);
        tOut.start();
        tErr.start();
        return process;
    }

    /** Run a classpose_tpu entrypoint module to completion. */
    public int run(String module, List<String> args)
            throws IOException, InterruptedException {
        Consumer<String> sink = mergedConsumer == null ? s -> { } : mergedConsumer;
        sink.accept("Running: " + pythonExecutable
                + " -m classpose_tpu.entrypoints." + module + " "
                + String.join(" ", args == null ? List.of() : args));
        Process p = start(module, args, null, null, sink, sink);
        return p.waitFor();
    }

    private static void streamLines(InputStream is, Consumer<String> consumer) {
        if (consumer == null) {
            try { is.readAllBytes(); } catch (IOException ignored) { }
            return;
        }
        try (BufferedReader br = new BufferedReader(
                new InputStreamReader(is, StandardCharsets.UTF_8))) {
            String line;
            while ((line = br.readLine()) != null)
                consumer.accept(line);
        } catch (IOException ignored) {
        }
    }

    /** Kill the running process (cancel button): destroy, wait, force. */
    public void cancel() {
        kill(process);
    }

    /** Best-effort kill of any process started by this runner. */
    public void kill(Process p) {
        if (p == null)
            return;
        try {
            p.destroy();
            try { Thread.sleep(500); } catch (InterruptedException ignored) { }
            if (p.isAlive())
                p.destroyForcibly();
            if (mergedConsumer != null)
                mergedConsumer.accept("Cancelled.");
        } catch (Throwable ignored) {
        }
    }

    private static String extendPath(String path) {
        String base = path == null ? "" : path;
        String home = System.getProperty("user.home");
        String[] extras = new String[] {
                "/opt/homebrew/bin",
                "/usr/local/bin",
                home == null ? null : home + "/.local/bin",
                home == null ? null : home + "/.pyenv/shims",
        };
        String result = base;
        for (String e : extras) {
            if (e == null)
                continue;
            if (!containsPathSegment(result, e)) {
                if (!result.isEmpty())
                    result += File.pathSeparator;
                result += e;
            }
        }
        return result;
    }

    private static boolean containsPathSegment(String path, String segment) {
        if (path == null || segment == null)
            return false;
        for (String p : path.split(java.util.regex.Pattern.quote(File.pathSeparator))) {
            if (segment.equals(p))
                return true;
        }
        return false;
    }

    private static String findOnPath(String exe, String path) {
        if (exe == null || exe.isEmpty())
            return null;
        String[] parts = path == null ? new String[0]
                : path.split(java.util.regex.Pattern.quote(File.pathSeparator));
        for (String dir : parts) {
            if (dir == null || dir.isEmpty())
                continue;
            File f = new File(dir, exe);
            if (f.exists() && f.isFile() && f.canExecute())
                return f.getAbsolutePath();
        }
        return null;
    }
}
