"""Round-4 probe: attempt a jax.profiler trace THROUGH the tunnel
(VERDICT r3 item 7; SURVEY §5 tracing row — the Unity-Profiler-marker
equivalent, reference Pipeline/Executable/Pipeline.cs:163-176).

Outcome (works / fails how) is recorded in BENCH_HISTORY.md either way;
cost_analysis remains the substitute if device-side xplane capture is
unsupported over the tunnel.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from noize_tpu.ops.fractal import fractal

OUT = "/tmp/noize_tpu_trace_r4"


def main():
    f = jax.jit(lambda x: fractal(
        2048, x, 0, noise_type="Simplex", octaves=13, hurst=0.4,
        noise_size=1700.0).sum())
    float(f(jnp.float32(3.0)))  # compile OUTSIDE the trace window

    t0 = time.perf_counter()
    try:
        with jax.profiler.trace(OUT):
            for i in range(3):
                float(f(jnp.float32(i)))
        dt = time.perf_counter() - t0
        files = sorted(glob.glob(OUT + "/**/*.*", recursive=True))
        info = [{"file": os.path.relpath(p, OUT),
                 "bytes": os.path.getsize(p)} for p in files]
        xplanes = [e for e in info if e["file"].endswith(".xplane.pb")]
        print(json.dumps({
            "probe": "jax_profiler_trace",
            "ok": bool(xplanes),
            "trace_wall_s": round(dt, 1),
            "n_files": len(info),
            "xplane_files": xplanes,
            "all_files": info[:20],
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "probe": "jax_profiler_trace", "ok": False,
            "error": f"{type(e).__name__}: {e}"[:400],
        }), flush=True)


if __name__ == "__main__":
    main()
