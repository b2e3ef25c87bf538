package qupath.ext.classpose.py;

import java.io.BufferedReader;
import java.io.IOException;
import java.io.InputStreamReader;
import java.util.ArrayList;
import java.util.List;
import java.util.function.Consumer;

/**
 * Spawns the classpose_tpu CLI as a subprocess, streaming stdout/stderr to
 * a log consumer, with cancellation support.
 *
 * <p>Invocation: {@code <python> -m classpose_tpu.entrypoints.<module>
 * <args...>}. The python executable defaults to "python" and can be
 * configured via {@link qupath.ext.classpose.util.Prefs}.
 */
public class PythonRunner {

    private final String pythonExecutable;
    private final Consumer<String> logConsumer;
    private Process process;

    public PythonRunner(String pythonExecutable, Consumer<String> logConsumer) {
        this.pythonExecutable = pythonExecutable == null || pythonExecutable.isBlank()
                ? "python" : pythonExecutable;
        this.logConsumer = logConsumer == null ? s -> {} : logConsumer;
    }

    /**
     * Run a classpose_tpu entrypoint module to completion.
     *
     * @param module module name under classpose_tpu.entrypoints,
     *               e.g. "predict_wsi"
     * @param args   CLI arguments
     * @return process exit code
     */
    public int run(String module, List<String> args)
            throws IOException, InterruptedException {
        List<String> command = new ArrayList<>();
        command.add(pythonExecutable);
        command.add("-m");
        command.add("classpose_tpu.entrypoints." + module);
        command.addAll(args);

        logConsumer.accept("Running: " + String.join(" ", command));
        ProcessBuilder pb = new ProcessBuilder(command);
        pb.redirectErrorStream(true);
        process = pb.start();

        try (BufferedReader reader = new BufferedReader(
                new InputStreamReader(process.getInputStream()))) {
            String line;
            while ((line = reader.readLine()) != null) {
                logConsumer.accept(line);
            }
        }
        return process.waitFor();
    }

    /** Kill the running process (cancel button). */
    public void cancel() {
        if (process != null && process.isAlive()) {
            process.destroy();
            if (process.isAlive()) {
                process.destroyForcibly();
            }
            logConsumer.accept("Cancelled.");
        }
    }
}
