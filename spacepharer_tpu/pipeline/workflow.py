"""Content-addressed, stage-granular workflow cache.

Parity target: the reference's checkpoint/resume model (SURVEY.md §5.4):
every workflow step is guarded by an exists-check on its artifact, the
tmp directory name is a hash of (command, parameters, inputs)
(Parameters::hashParameter + FileUtil::createTemporaryDirectory,
src/workflow/PredictMatch.cpp:49-56), and a ``latest`` symlink points at
the most recent run. Killing and re-running any workflow resumes at the
first missing artifact; changing parameters changes the hash and starts
fresh.

Artifacts here are pickled Python stage results instead of text DBs.
"""
import hashlib
import os
import pickle

from ..logging import info


def _hash_inputs(command: str, params_repr: str, inputs) -> str:
    h = hashlib.sha256()
    h.update(command.encode())
    h.update(params_repr.encode())
    for path in inputs:
        h.update(str(path).encode())
        try:
            if os.path.isdir(path):
                # SetDB directory: hash the data files only; persisted
                # prefilter indexes (index_*), masked-target caches
                # (mask_*) and resume stamps are derived artifacts whose
                # appearance must not invalidate workflow resume
                for name in sorted(os.listdir(path)):
                    if (name.startswith("index_") or name.startswith("mask_")
                            or name == "createsetdb.stamp"):
                        continue
                    st = os.stat(os.path.join(path, name))
                    h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
            else:
                st = os.stat(path)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            pass
    return h.hexdigest()[:16]


class WorkflowCache:
    """Stage-granular artifact store under <tmp>/<param-hash>/."""

    def __init__(self, tmp_dir: str, command: str, params_repr: str,
                 inputs=(), reuse_latest: bool = False):
        os.makedirs(tmp_dir, exist_ok=True)
        if reuse_latest and os.path.islink(os.path.join(tmp_dir, "latest")):
            h = os.readlink(os.path.join(tmp_dir, "latest"))
        else:
            h = _hash_inputs(command, params_repr, inputs)
        self._writers = []
        self.dir = os.path.join(tmp_dir, h)
        os.makedirs(self.dir, exist_ok=True)
        latest = os.path.join(tmp_dir, "latest")
        try:
            if os.path.islink(latest):
                os.unlink(latest)
            os.symlink(h, latest)
        except OSError:
            pass

    def path(self, name: str) -> str:
        return os.path.join(self.dir, name + ".pkl")

    def has(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def load(self, name: str):
        with open(self.path(name), "rb") as fh:
            return pickle.load(fh)

    def save(self, name: str, obj):
        tmp = self.path(name) + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, self.path(name))  # atomic: resume-safe artifacts

    def save_async(self, name: str, obj):
        """Queue the artifact write on a background thread: the
        tmp-file + atomic-rename protocol keeps resume safe (a killed
        run either has the complete artifact or none), so the pipeline
        need not wait for serialization of large stage results."""
        import threading
        t = threading.Thread(target=self.save, args=(name, obj),
                             daemon=False)
        t.start()
        self._writers.append(t)

    def flush(self):
        for t in self._writers:
            t.join()
        self._writers.clear()

    def get_or_compute(self, name: str, fn):
        if self.has(name):
            info(f"[resume] {name}: reusing cached artifact")
            return self.load(name)
        import time as _time
        t0 = _time.time()
        result = fn()
        info(f"Time for {name}: {_time.time() - t0:.3f}s")
        barrier = os.environ.get("SPACEPHARER_STAGE_BARRIER")
        if barrier == name:
            # Test hook: commit this stage's artifact synchronously,
            # then pause so a kill-mid-run test can land its SIGKILL
            # deterministically between two stages.
            import time
            self.save(name, result)
            time.sleep(float(os.environ.get(
                "SPACEPHARER_STAGE_BARRIER_SECS", "600")))
            return result
        self.save_async(name, result)
        return result


class NullCache:
    """No-op cache (in-memory pipelines, tests)."""

    def get_or_compute(self, name, fn):
        return fn()

    def flush(self):
        pass
