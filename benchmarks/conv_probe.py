"""U-Net shallow-conv throughput probe on the TPU: direct vs channel-packed
(space-to-depth) execution (round-2 verdict, missing #2).

The <=64-channel high-resolution stages put only C of the MXU's 128 lanes
to work. Candidate rewrites, all mathematically exact (struct-zero
weights):

  * s2d-shift: pad-shifted s2d; each SAME 3x3 conv at (H,W,C) becomes a
    VALID 2x2 conv at (H/2+1, H/2+1, 4C) -> 16/9 MACs, 4x lanes. Chaining
    needs a repad between convs, done IN-DOMAIN as a channel shuffle of
    4 shifted cell views (no d2s/s2d transposes).
  * s2d-dense: plain s2d; each conv becomes a SAME 3x3 conv over cells
    with (4C -> 4C) weights (25% dense) -> 4x MACs, 4x lanes, NO repad.

Timing: the op chain loops inside one jitted fori_loop whose carry feeds
back into the input (the full output is summed, defeating DCE), and the
per-iteration time is the slope between two loop lengths (survives the
~60 ms tunnel RTT, CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOOP_LO, LOOP_HI = 10, 60  # fori_loop lengths for the slope timing
# (name, H, Cin, Cout) of the shallow U-Net ConvBlocks under test.
BLOCKS = (("inc", 128, 32, 32), ("up4", 128, 96, 32),
          ("down1", 64, 64, 64), ("up3", 64, 192, 64))
# (dtype name, (Cin, Cout, H, key)) for the fused-Pallas real-block A/B.
PALLAS_CONFIGS = (("f32", (2, 32, 128, "increal")),
                  ("bf16", (2, 32, 128, "increal")),
                  ("f32", (96, 32, 128, "up4real")),
                  ("bf16", (96, 32, 128, "up4real")))


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

    lo, hi = LOOP_LO, LOOP_HI
    return (wall(hi) - wall(lo)) / (hi - lo)


# The packing/unpacking helpers under test are the SHIPPED ops — the
# probe validates and times the exact code the model runs
# (dt4image_restoration_tpu/ops/image.py), not a private copy.


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    B = int(os.environ.get("PROBE_BATCH", "16"))
    rng = np.random.default_rng(0)
    results = {"batch": B, "device": str(jax.devices()[0].device_kind),
               "tpu_unreachable": tpu_unreachable}

    def conv(x, w, padding):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    from dt4image_restoration_tpu.ops.image import (
        depth_to_space as d2s, pack_conv_weights, repad_cells,
        space_to_depth as s2d_plain, space_to_depth_shifted as s2d_shift)
    from dt4image_restoration_tpu.ops.winograd import winograd_conv3x3_same

    def wino(x, w):
        return winograd_conv3x3_same(x, w)

    def pack_w_shift(w):
        return pack_conv_weights(jnp.asarray(w, jnp.float32), "shift")

    def pack_w_dense(w):
        return pack_conv_weights(jnp.asarray(w, jnp.float32), "dense")

    repad_indomain = repad_cells

    # --- correctness of all rewrites on a small case ----------------------
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, 5)), jnp.float32)
    ref = conv(x, w, "SAME")
    got_shift = d2s(conv(s2d_shift(x), jnp.asarray(pack_w_shift(w)),
                         "VALID"))
    np.testing.assert_allclose(np.asarray(got_shift), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    got_dense = d2s(conv(s2d_plain(x), jnp.asarray(pack_w_dense(w)),
                         "SAME"))
    np.testing.assert_allclose(np.asarray(got_dense), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(repad_indomain(s2d_plain(x))),
                               np.asarray(s2d_shift(x)), atol=0)
    # Winograd band: the s2d rewrites run the SAME conv op on both sides
    # (identical TPU bf16 tap rounding cancels), but Winograd is a
    # different algorithm — on real TPU both paths multiply in bf16 and
    # round DIFFERENTLY, so the band is bf16-epsilon-scale there (same
    # rationale as the fused-kernel band below; exact-f32 parity is
    # pinned on CPU in tests/test_unet.py and the PSNR gate in bench.py
    # covers TPU end to end).
    np.testing.assert_allclose(np.asarray(wino(x, w)), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)
    results["rewrites_correct"] = True

    # --- block-level A/B: the 3-conv LeakyReLU blocks ---------------------
    # PROBE_PALLAS_ONLY=1 skips this ~10-min sweep to re-measure just the
    # fused-kernel section below.
    sweep = () if os.environ.get("PROBE_PALLAS_ONLY") else (
        ("f32", jnp.float32), ("bf16", jnp.bfloat16))
    for dt_name, dt in sweep:
        for name, h, cin, cout in BLOCKS:
            x = jnp.asarray(rng.standard_normal((B, h, h, cin)), dt)
            w1 = jnp.asarray(
                0.05 * rng.standard_normal((3, 3, cin, cout)), dt)
            wb = jnp.asarray(
                0.05 * rng.standard_normal((3, 3, cout, cout)), dt)
            w1s = jnp.asarray(pack_w_shift(w1), dt)
            wbs = jnp.asarray(pack_w_shift(wb), dt)
            w1d = jnp.asarray(pack_w_dense(w1), dt)
            wbd = jnp.asarray(pack_w_dense(wb), dt)

            def direct_block(x, w1, wb, feedback=0.0):
                x = x + jnp.asarray(feedback, x.dtype)
                y = jax.nn.leaky_relu(conv(x, w1, "SAME"), 0.2)
                y = jax.nn.leaky_relu(conv(y, wb, "SAME"), 0.2)
                return conv(y, wb, "SAME")

            def shift_block(x, w1, wb, feedback=0.0):
                x = x + jnp.asarray(feedback, x.dtype)
                y = conv(s2d_shift(x), w1, "VALID")
                y = jax.nn.leaky_relu(y, 0.2)
                y = conv(repad_indomain(y), wb, "VALID")
                y = jax.nn.leaky_relu(y, 0.2)
                return conv(repad_indomain(y), wb, "VALID")

            def dense_block(x, w1, wb, feedback=0.0):
                x = x + jnp.asarray(feedback, x.dtype)
                y = conv(s2d_plain(x), w1, "SAME")
                y = jax.nn.leaky_relu(y, 0.2)
                y = jax.nn.leaky_relu(conv(y, wb, "SAME"), 0.2)
                return conv(y, wb, "SAME")

            def wino_block(x, w1, wb, feedback=0.0):
                # Winograd F(2x2,3x3): 2.25x fewer MACs per conv
                # (ops/winograd.py — the MAC-reduction lever at the
                # compute-bound knee, RESULTS.md round-4 attribution).
                x = x + jnp.asarray(feedback, x.dtype)
                y = jax.nn.leaky_relu(wino(x, w1), 0.2)
                y = jax.nn.leaky_relu(wino(y, wb), 0.2)
                return wino(y, wb)

            t_dir = time_fn(direct_block, x, w1, wb)
            t_shift = time_fn(shift_block, x, w1s, wbs)
            t_dense = time_fn(dense_block, x, w1d, wbd)
            t_wino = time_fn(wino_block, x, w1, wb)
            flops = 2 * B * h * h * 9 * (cin * cout + 2 * cout * cout)
            key = f"{name}_{dt_name}"
            results[f"{key}_direct_us"] = round(t_dir * 1e6, 1)
            results[f"{key}_direct_tf"] = round(flops / t_dir / 1e12, 1)
            results[f"{key}_s2dshift_us"] = round(t_shift * 1e6, 1)
            results[f"{key}_s2dshift_speedup"] = round(t_dir / t_shift, 2)
            results[f"{key}_s2ddense_us"] = round(t_dense * 1e6, 1)
            results[f"{key}_s2ddense_speedup"] = round(t_dir / t_dense, 2)
            results[f"{key}_winograd_us"] = round(t_wino * 1e6, 1)
            results[f"{key}_winograd_speedup"] = round(t_dir / t_wino, 2)
            print(json.dumps({key: {
                "direct_us": results[f"{key}_direct_us"],
                "tf": results[f"{key}_direct_tf"],
                "shift_x": results[f"{key}_s2dshift_speedup"],
                "dense_x": results[f"{key}_s2ddense_speedup"],
                "wino_x": results[f"{key}_winograd_speedup"]}}),
                file=sys.stderr)

    # --- fused Pallas whole-block kernel on the REAL 128^2 blocks ---------
    # increal: 2-channel image+sigma input, 3 layers of 32 features;
    # up4real: the decoder's 96-channel concat input (row-tiled).
    # ops/pallas/conv_block.py keeps inter-layer intermediates in VMEM
    # instead of XLA's per-conv HBM round trips.
    from dt4image_restoration_tpu.ops.pallas import fused_conv_block

    for dt_name, (cin, cout, h, key_base) in PALLAS_CONFIGS:
        dt = jnp.float32 if dt_name == "f32" else jnp.bfloat16
        x = jnp.asarray(rng.standard_normal((B, h, h, cin)), dt)
        ws = [jnp.asarray(0.05 * rng.standard_normal(
            (3, 3, cin if i == 0 else cout, cout)), dt) for i in range(3)]
        bs = [jnp.asarray(0.05 * rng.standard_normal((cout,)), dt)
              for _ in range(3)]
        wsd = [jnp.asarray(pack_w_dense(w), dt) for w in ws]

        def direct3(x, feedback=0.0):
            y = x + jnp.asarray(feedback, x.dtype)
            for w, b in zip(ws, bs):
                y = jax.nn.leaky_relu(conv(y, w, "SAME") + b, 0.2)
            return y

        def dense3(x, feedback=0.0):
            y = s2d_plain(x + jnp.asarray(feedback, x.dtype))
            from dt4image_restoration_tpu.ops.image import pack_conv_bias
            for w, b in zip(wsd, bs):
                y = jax.nn.leaky_relu(
                    conv(y, w, "SAME") + jnp.asarray(pack_conv_bias(b), dt),
                    0.2)
            return d2s(y)

        def pallas3(x, feedback=0.0):
            return fused_conv_block(x + jnp.asarray(feedback, x.dtype),
                                    ws, bs)

        key = f"{key_base}_{dt_name}"
        # First-ever Mosaic compile of this kernel may happen right here
        # (interpret tests cover CPU only) — a per-config guard keeps one
        # failing shape/dtype from losing the whole probe's JSON line.
        try:
            np.testing.assert_allclose(
                np.asarray(pallas3(x), np.float32),
                np.asarray(direct3(x), np.float32),
                # f32 band: on real TPU BOTH paths multiply in bf16 on the
                # MXU (default precision) in different tap orders — max abs
                # ~3e-3 observed on N(0,1) activations through 3 layers.
                # Exact f32 parity (2e-5) is pinned separately in
                # tests/test_pallas.py via interpret mode.
                rtol=(5e-3 if dt_name == "f32" else 0.1),
                atol=(5e-3 if dt_name == "f32" else 0.05))
            t_pal = time_fn(pallas3, x)
        except Exception as e:
            results[f"{key}_pallas_error"] = repr(e)[:200]
            print(json.dumps({key: {"pallas_error": repr(e)[:200]}}),
                  file=sys.stderr)
            continue
        t_dir = time_fn(direct3, x)
        t_dense = time_fn(dense3, x)
        flops = 2 * B * h * h * 9 * (cin * cout + 2 * cout * cout)
        results[f"{key}_direct_us"] = round(t_dir * 1e6, 1)
        results[f"{key}_direct_tf"] = round(flops / t_dir / 1e12, 1)
        results[f"{key}_s2ddense_us"] = round(t_dense * 1e6, 1)
        results[f"{key}_s2ddense_speedup"] = round(t_dir / t_dense, 2)
        results[f"{key}_pallas_us"] = round(t_pal * 1e6, 1)
        results[f"{key}_pallas_speedup"] = round(t_dir / t_pal, 2)
        print(json.dumps({key: {
            "direct_us": results[f"{key}_direct_us"],
            "dense_x": results[f"{key}_s2ddense_speedup"],
            "pallas_x": results[f"{key}_pallas_speedup"]}}),
            file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
