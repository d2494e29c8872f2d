"""Long-lived chip job runner.

The axon TPU tunnel wedges when a client is killed mid-call, and every
new process pays (and can lose) the session setup — so all real-chip
experiments run inside ONE persistent process.  Jobs are python files
dropped into the queue directory; each is exec'd in this process (jax
already initialized, compile cache warm), stdout+traceback land in
`<job>.out`, and the job file is renamed to `<job>.done`.

    nohup setsid python -u benchmarks/chipserver.py &   # once
    cp myjob.py /tmp/chipjobs/10_myjob.py               # enqueue
    cat /tmp/chipjobs/10_myjob.out                      # result

A `STOP` file in the queue directory shuts the server down cleanly
(never kill it mid-job).  Heartbeat: `hb` file, touched every poll.
"""

import contextlib
import io
import os
import sys
import time
import traceback

QDIR = "/tmp/chipjobs"


def main() -> None:
    os.makedirs(QDIR, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print("chipserver up, importing jax...", flush=True)
    import jax  # noqa: F401  (one-time session setup)

    print("devices:", jax.devices(), flush=True)
    shared: dict = {}  # opt-in cross-job state: jobs read/write shared["..."]
    while True:
        with open(os.path.join(QDIR, "hb"), "w") as f:
            f.write(str(time.time()))
        if os.path.exists(os.path.join(QDIR, "STOP")):
            print("STOP seen, exiting", flush=True)
            return
        jobs = sorted(
            f for f in os.listdir(QDIR)
            if f.endswith(".py") and not f.startswith(".")
        )
        if not jobs:
            time.sleep(2)
            continue
        job = jobs[0]
        path = os.path.join(QDIR, job)
        print("running", job, flush=True)
        buf = io.StringIO()
        t0 = time.time()
        try:
            src = open(path).read()
            # fresh namespace per job (device buffers die with it —
            # leaked HBM across jobs crashed the worker once); pass
            # `shared` for opt-in cross-job state
            ns = {"shared": shared}
            with contextlib.redirect_stdout(buf):
                exec(compile(src, path, "exec"), ns)
            status = "OK"
        except BaseException:
            buf.write("\n" + traceback.format_exc())
            status = "FAIL"
        dt = time.time() - t0
        with open(path + ".out", "w") as f:
            f.write(f"# {status} in {dt:.1f}s\n" + buf.getvalue())
        os.rename(path, path + ".done")
        del ns
        import gc

        gc.collect()
        print(f"{job}: {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
