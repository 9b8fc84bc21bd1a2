#!/usr/bin/env python
"""True-barrier re-measurement of dense-inference kernel throughput.

The round-2 table in docs/BENCHMARKS.md ("Dense-inference kernel
throughput": Pallas fused 3.57 ms vs unfused 3.91 ms at the reference
shape) was timed with `jax.block_until_ready`, which is NOT a barrier on
the axon tunnel backend (utils/platform.py::device_barrier, measured
2026-08-18). The r3b large-N re-map under the true barrier showed the
Pallas paths LOSING at every synthetic (N, k) cell — this script re-times
the exact reference shape (multi-resolution 25+81+121 Wendland + 10+15+45
temporal RBF + [256,256,128] MLP + 5-quantile δ-head) so the round-2 claim
is either confirmed or corrected on the same workload it was made for.

Paths compared, interleaved (a,b,a,b per rep so tunnel drift cancels):
  xla     — plain jnp forward (XLA-fused embed)
  pallas  — standalone Pallas basis kernel (`use_pallas=True`)
  fused   — fused basis→layer-1 inference kernel if available

Usage: python scripts/bench_dense_inference.py [--n 131072] [--reps 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from st_dadk_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default=str(
        REPO / "results" / "dense_inference_r3.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from st_dadk_tpu.models.st_interp import (ModelSpec, forward, init_model)
    from st_dadk_tpu.utils.platform import device_barrier

    print(f"[dense-inference] backend={jax.default_backend()} n={args.n}")

    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(size=(args.n, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(args.n, 1)), jnp.float32)

    def make(use_pallas):
        spec = ModelSpec(
            k_spatial_centers=(25, 81, 121), k_temporal_centers=(10, 15, 45),
            hidden_dims=(256, 256, 128), dropout=0.1, spatial_learnable=True,
            output_dim=5, use_delta_reparameterization=True,
            use_pallas=use_pallas)
        params, consts = init_model(jax.random.PRNGKey(0), spec)
        fn = jax.jit(lambda p, c: forward(spec, p, c, None, coords, t,
                                          train=False))
        return fn, params, consts

    arms = {"xla": make(False), "pallas": make(True)}

    # warm both
    for name, (fn, p, c) in arms.items():
        device_barrier(fn(p, c))
        device_barrier(fn(p, c))
        print(f"  warmed {name}")

    # Two regimes, both with the TRUE barrier (device_barrier):
    #  - throughput: queue `reps` calls, one end barrier (time_call's
    #    pattern — what a chunked dense-grid eval actually does)
    #  - latency: barrier every call (single-request serving cost on the
    #    tunnel; dominated by the ~50 ms RPC round-trip)
    summary = {"n": args.n, "reps": args.reps}
    order = list(arms.items())
    for trial in range(3):  # interleave arms 3x, keep best trial per arm
        for name, (fn, p, c) in (order if trial % 2 == 0 else order[::-1]):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = fn(p, c)
            device_barrier(out)
            amort = (time.perf_counter() - t0) / args.reps * 1e3
            lat0 = time.perf_counter()
            device_barrier(fn(p, c))
            lat = (time.perf_counter() - lat0) * 1e3
            cur = summary.get(name)
            if cur is None or amort < cur["amortized_ms"]:
                summary[name] = {"amortized_ms": round(amort, 3),
                                 "latency_ms": round(lat, 3),
                                 "mpts_per_s": round(args.n / amort / 1e3, 1)}
    for name in arms:
        s = summary[name]
        print(f"  {name:7s}: amortized {s['amortized_ms']:6.2f} ms "
              f"({s['mpts_per_s']:5.1f} M pts/s)   "
              f"single-call latency {s['latency_ms']:6.2f} ms")
    ratio = summary["pallas"]["amortized_ms"] / summary["xla"]["amortized_ms"]
    summary["pallas_over_xla_ratio"] = round(ratio, 4)
    print(f"  pallas/xla amortized ratio: {ratio:.3f} "
          f"({'pallas wins' if ratio < 1 else 'xla wins'})")
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(f"[OK] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
