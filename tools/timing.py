"""Relay-safe on-chip timing helper shared by the stage profilers.

Timing rules for the axon relay (see BENCHLOG "Measured TPU gather law"):

* every iteration must carry a genuine data dependence -- XLA hoists
  loop-invariant bodies out of scans, so naive timing loops measure nothing;
* each measurement must force a host readback (``block_until_ready`` is not
  a reliable barrier through the relay);
* loops run device-side in one ``lax.scan`` dispatch so the ~28 ms relay
  round trip is paid once per measurement, not once per iteration.

The perturbation multiplies every floating input by ``(1 + carry * 1e-30)``
**in the input's own dtype**: a traced factor defeats hoisting, while
keeping bf16 inputs bf16 -- promoting the bf16 atlases to f32 would double
the gathered row bytes and misreport exactly the gather costs these
profilers exist to measure.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_scan(fn, *args, iters=8, label="", label_width=46):
    """Mean ms/iter of ``fn(*args)`` with an inter-iteration dependence."""

    def loop(n_static, *a):
        def body(carry, _):
            def perturb(x):
                x = jnp.asarray(x)
                if not jnp.issubdtype(x.dtype, jnp.floating):
                    # SMALL integer inputs (gather indices!) get a traced
                    # zero added: without it an integer-indexed gather of
                    # an integer table is loop-invariant and XLA hoists it
                    # out of the scan -- round-5 measured a 6 ms "fast u8
                    # gather" that was really the hoisted gather's blend
                    # tail (BENCHLOG round-5 gather-law correction).  Big
                    # integer tables stay untouched: rewriting a 200 MB
                    # atlas every iteration would distort the measurement
                    # the other way.
                    if (jnp.issubdtype(x.dtype, jnp.integer)
                            and x.size * x.dtype.itemsize <= (32 << 20)):
                        return x + (carry * 1e-30).astype(x.dtype)
                    return x
                # factor computed in f32, applied in x.dtype (no promotion)
                return x * (1.0 + carry * 1e-30).astype(x.dtype)

            out = fn(*jax.tree_util.tree_map(perturb, a))
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact)]
            probe = sum(
                jnp.asarray(l).ravel()[0].astype(jnp.float32) for l in leaves
            )
            return carry + probe * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_static)
        return c

    jl = jax.jit(loop, static_argnums=(0,))

    def run(n):
        # the relay sporadically drops a remote_compile/execute mid-read
        # ("response body closed before all bytes were read"); one stage
        # dying must not lose the rest of a metal window -- retry with
        # backoff before giving up on the row
        for attempt in range(3):
            try:
                return float(jl(n, *args))
            except Exception as e:  # jax.errors.JaxRuntimeError and kin
                if attempt == 2 or "INTERNAL" not in str(e):
                    raise
                print(f"  [retry {attempt + 1}] transient relay error on "
                      f"'{label}': {str(e).splitlines()[0][:120]}", flush=True)
                time.sleep(20 * (attempt + 1))

    t0 = time.monotonic()
    run(1)  # compile + 1 iter
    compile_s = time.monotonic() - t0
    run(iters)  # second compile (different length) -- cheapish
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        run(iters)
        best = min(best, (time.monotonic() - t0) / iters * 1e3)
    print(f"{label:<{label_width}} {best:8.2f} ms/iter   "
          f"(compile {compile_s:.0f}s)", flush=True)
    return best
