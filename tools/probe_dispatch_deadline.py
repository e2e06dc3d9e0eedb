"""Probe the remote-TPU service's single-dispatch execution deadline.

r4 evidence: every run whose single device dispatch exceeds ~80 s now
dies with "TPU worker process crashed or restarted" (3DIdent ResNet
chunk-1000 ~6 min: 3/3 crashes; box+gennorm3 chunk-3000 ~90 s: 6/6),
while dispatches under ~60 s pass (same programs at smaller chunk).
The r3 30k runs executed 6-minute dispatches fine, so this is a
service-side change, not a program bug.

Runs one jitted lax.scan of K chained 8192x8192 f32 matmuls per step,
scaling the scan length to target increasing wall durations, and
reports the largest duration that completes. Usage:
    python tools/probe_dispatch_deadline.py [durations_s ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

N = 8192


def make_fn(length):
    def step(x, _):
        return x @ x * (1.0 / N), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(step, x, None, length=length)
        return jnp.sum(y)

    return run


def time_len(length, x, fn=None):
    fn = fn or make_fn(length)
    t0 = time.time()
    v = float(fn(x))  # value fetch = real sync on this backend
    return time.time() - t0, v


def main():
    targets = [float(a) for a in sys.argv[1:]] or [10, 30, 60, 120, 240]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N), jnp.float32)

    # Calibrate on ONE program, timed on its cached second call so no
    # compile/remote-compile latency pollutes the estimate. (The first
    # attempt differenced two lengths; remote-compile latency noise
    # swamped the execution delta and under-read per-step 200x, so the
    # first target extrapolated a 100k-step scan and crashed the
    # worker immediately.)
    cal_len = 200
    fn = make_fn(cal_len)
    d_cold, _ = time_len(cal_len, x, fn)
    d_warm, _ = time_len(cal_len, x, fn)
    per = max(d_warm / cal_len, 1e-4)
    print(f"calibration: cold {d_cold:.1f}s warm {d_warm:.1f}s -> "
          f"{per*1e3:.2f} ms/step", flush=True)

    for tgt in targets:
        length = max(int(tgt / per), 1)
        print(f"target {tgt:.0f}s -> scan length {length} ...", flush=True)
        try:
            dt, v = time_len(length, x)
            print(f"  OK in {dt:.1f}s (value {v:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001 - record the failure mode
            print(f"  FAILED after dispatch: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
