"""Attribution of the batched-rollout knee (VERDICT r3 item 6): where does
the per-iteration time go at B=128?

Times each component of one ADMM iteration (env/pnp.py admm_step — the
bench.py headline inner loop) in isolation with the same slope method the
conv probe uses (fori_loop with a feedback-carried sum so XLA cannot dead-
code or batch-overlap the iterations; per-iteration time = the slope
between two loop lengths, which survives the tunnel's ~60 ms RTT and
+-40% dispatch jitter):

  * unet    — the shipped UNetDenoiser forward (NHWC), the conv workload
  * fft     — fft2c + ifft2c pair on (B,1,H,W) complex64
  * kspace  — the masked data-consistency elementwise op
  * layout  — the step's pure data-movement: NCHW<->NHWC moveaxis around
              the denoiser + the ri<->complex stacking of z/u
  * psnr    — the per-iteration reward reduction
  * full    — the whole admm_step (with reward), as shipped

The components are timed on the SHIPPED ops (no private copies). A sum
close to `full` means XLA gains little from cross-component fusion and
the residue is the conv/FFT device time; a sum well above `full` means
the layout ops are already fused into their neighbors.

Run on TPU:  PROBE_BATCH=128 python benchmarks/knee_profile.py
Prints one JSON line. Optionally set DT4IR_TRACE_DIR to also capture a
jax.profiler trace of the full step for offline inspection.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOOP_LO, LOOP_HI = 10, 60


def time_fn(fn, *args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(n, *args):
        def body(i, s):
            y = fn(*args, feedback=s * 1e-30)
            return s + jnp.sum(y.astype(jnp.float32)) * 1e-20
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def wall(n, reps=2):
        float(np.asarray(run(n, *args)))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(n, *args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (wall(LOOP_HI) - wall(LOOP_LO)) / (LOOP_HI - LOOP_LO)


def time_rollout(step, carry0):
    """Slope-time a loop that threads ``carry0`` through ``step`` — the
    shipped rollout's own dependence structure. The feedback trick of
    ``time_fn`` is WRONG for the full ADMM step: ``admm_step``'s output
    does not depend on the previous ``x`` (the denoiser consumes
    ``Re(z - u)``), so a perturbation injected via ``x`` is dead code and
    XLA hoists the entire loop-invariant step out of the timing loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(n, carry):
        return lax.fori_loop(0, n, lambda i, c: step(c), carry)

    def wall(n, reps=2):
        def fetch():
            out = run(n, carry0)
            return float(np.asarray(jnp.sum(
                jax.tree.leaves(out)[0].astype(jnp.float32))))
        fetch()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (wall(LOOP_HI) - wall(LOOP_LO)) / (LOOP_HI - LOOP_LO)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.env.pnp import admm_step, compute_reward
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.ops import (
        fft2c, ifft2c, kspace_consistency)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    B = int(os.environ.get("PROBE_BATCH", "128"))
    H = 128
    dt_name = os.environ.get("PROBE_DTYPE", "float32")
    conv_dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    results = {"batch": B, "dtype": dt_name,
               "device": str(jax.devices()[0].device_kind),
               "tpu_unreachable": tpu_unreachable}

    params = convert_unet_state_dict(random_unet_state_dict(0))
    model = UNetDenoiser(dtype=conv_dt)

    def denoise(img, sigma):
        return model.apply({"params": params}, img, sigma)

    # Shapes exactly as the rollout carries them.
    ri = lambda: jnp.asarray(
        rng.standard_normal((B, 1, H, H, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (B, 1, H, H)), jnp.float32)
    z, u, y0 = ri(), ri(), ri()
    mask = jnp.asarray(rng.uniform(size=(B, 1, H, H)) < 0.3)
    gt = jnp.asarray(rng.uniform(0, 1, (B, 1, H, H)), jnp.float32)
    nhwc = jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)), jnp.float32)
    sigma = jnp.full((B,), 0.06, jnp.float32)
    mu = jnp.full((B,), 0.3, jnp.float32)
    zc = jax.lax.complex(z[..., 0], z[..., 1])

    def t_unet(a, feedback=0.0):
        return denoise(a + feedback, sigma).astype(jnp.float32)

    def t_fft(a, feedback=0.0):
        return jnp.abs(ifft2c(fft2c(a + feedback)))

    def t_kspace(a, feedback=0.0):
        # Build the complex y0 INSIDE the jitted fn: a complex64 device
        # array captured as a closure is constant-folded at trace time via
        # a device->host fetch, which the tunnel rejects (Unimplemented) —
        # CLAUDE.md's ri-pairs-outside-jit rule.
        y0c_ = jax.lax.complex(y0[..., 0], y0[..., 1])
        return jnp.abs(kspace_consistency(
            a + feedback, y0c_, mask, mu[:, None, None, None]))

    def t_layout(a, feedback=0.0):
        # the step's data movement: z/u ri->complex, NCHW->NHWC->NCHW
        # around the denoiser, complex->ri of two results
        img = (z[..., 0] + feedback) - u[..., 0]
        den = jnp.moveaxis(jnp.moveaxis(img, 1, -1), -1, 1)
        uc = jax.lax.complex(u[..., 0], u[..., 1]) + 0j * a
        zri = jnp.stack([jnp.real(uc), jnp.imag(uc)], -1)
        uri = jnp.stack([jnp.real(uc) + den, jnp.imag(uc)], -1)
        return zri + uri

    def t_psnr(a, feedback=0.0):
        return compute_reward(
            type("S", (), {"x_real": a + feedback, "gt": gt,
                           "batch": B})())

    from dt4image_restoration_tpu.env.pnp import CSMRIState
    state = CSMRIState(x=x, z=z, u=u, mask=mask, y0=y0, gt=gt,
                       T=jnp.zeros((B,)), done=jnp.zeros((B,), bool))
    action = {"T": jnp.zeros((B,)), "mu": 0.3, "sigma_d": 0.06}

    # The full step is timed by threading the REAL state through the loop
    # (time_rollout) — the shipped rollout's own dependence chain, with the
    # per-step reward folded into a carried accumulator.
    def step_real(c):
        s, acc = c
        new = admm_step(denoise, s, action)
        return new, acc + jnp.sum(compute_reward(new))

    # A/B for PARITY.md D16 (x stored real): emulate the pre-D16 carry —
    # x as (B,1,H,W,2) with a zero imaginary plane, the step consuming
    # x[..., 0] and re-stacking a zero plane, exactly as the old
    # admm_step's `x_new = stack([x_real, zeros])` did. The delta vs
    # full_step_ms is the pure HBM cost of carrying the dead plane.
    x_ri = jnp.stack([x, jnp.zeros_like(x)], -1)

    def step_xri(c):
        x_ri_, z_, u_, T_, done_, acc = c
        s = CSMRIState(x=x_ri_[..., 0], z=z_, u=u_, mask=mask, y0=y0,
                       gt=gt, T=T_, done=done_)
        new = admm_step(denoise, s, action)
        return (jnp.stack([new.x, jnp.zeros_like(new.x)], -1),
                new.z, new.u, new.T, new.done,
                acc + jnp.sum(compute_reward(new)))

    comps = {
        "unet_ms": (t_unet, nhwc),
        "fft_ms": (t_fft, zc),
        "kspace_ms": (t_kspace, zc),
        "layout_ms": (t_layout, zc),
        "psnr_ms": (t_psnr, x),
    }
    for key, (fn, arg) in comps.items():
        results[key] = round(1e3 * time_fn(fn, arg), 4)
        print(f"[knee] {key}: {results[key]} ms", file=sys.stderr,
              flush=True)
    rollouts = {
        "full_step_ms": (step_real, (state, jnp.float32(0.0))),
        "full_step_xri_ms": (step_xri, (x_ri, z, u, state.T, state.done,
                                        jnp.float32(0.0))),
    }
    for key, (step, carry0) in rollouts.items():
        results[key] = round(1e3 * time_rollout(step, carry0), 4)
        print(f"[knee] {key}: {results[key]} ms", file=sys.stderr,
              flush=True)

    parts = sum(results[k] for k in
                ("unet_ms", "fft_ms", "kspace_ms", "layout_ms", "psnr_ms"))
    results["component_sum_ms"] = round(parts, 4)
    results["xri_overhead_pct"] = round(
        100.0 * (results["full_step_xri_ms"] - results["full_step_ms"])
        / results["full_step_ms"], 2)
    results["fusion_gain_ms"] = round(parts - results["full_step_ms"], 4)
    results["unet_share_of_full"] = round(
        results["unet_ms"] / results["full_step_ms"], 3)
    results["slices_per_sec_implied"] = round(
        1e3 * B / (30 * results["full_step_ms"]), 2)

    trace_dir = os.environ.get("DT4IR_TRACE_DIR")
    if trace_dir:
        import jax.profiler
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(step_real((state, jnp.float32(0.0))))
        results["trace_dir"] = trace_dir

    print(json.dumps({"metric": "knee_attribution", **results}))


if __name__ == "__main__":
    main()
