"""PnP-ADMM environment for CSMRI, as pure functions over a state pytree.

Behavioral parity with /root/reference/evaluation/env.py:30-117, redesigned
for XLA: the mutable OrderedDict becomes an immutable ``CSMRIState``
dataclass pytree; the Python early-return on ``T > 0.5`` (env.py:79-83)
becomes a carried ``done`` mask so a whole episode compiles into one
``lax.scan``; everything is batched over a leading slice axis and shards
over the device mesh's data axis.

Complex values are stored as trailing real/imag float32 pairs (the same
layout the .mat records use) and materialize as complex64 only *inside*
jitted computations — complex buffers never cross the host<->device
boundary, which the TPU runtime does not support for transfers.

One ADMM iteration (env.py:85-98):
    x   = denoiser(Re(z - u), sigma_d)            # plug-in prior
    z~  = F(x + u)                                # centered ortho FFT
    z~  = (mu*z~ + y0)/(1+mu) on sampled k-space  # data consistency
    z   = F^-1(z~)
    u   = u + x - z                               # dual ascent
    T  += 1/30
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dt4image_restoration_tpu.ops import fft2c, ifft2c, kspace_consistency, psnr


def to_complex(ri: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) real/imag pair -> complex64."""
    return jax.lax.complex(ri[..., 0], ri[..., 1])


def from_complex(c: jnp.ndarray) -> jnp.ndarray:
    """complex -> (..., 2) real/imag pair (float32)."""
    return jnp.stack([jnp.real(c), jnp.imag(c)], axis=-1)


class CSMRIState(struct.PyTreeNode):
    """ADMM state for a batch of 128x128 CSMRI slices, canonical layout
    (B, 1, H, W[, 2]).

    Mirrors the reference's state dict (env.py:71), except ``x`` is stored
    REAL (B, 1, H, W): the reference keeps ``x`` complex until the first
    denoiser write, but its imaginary plane is never read anywhere in the
    loop (the denoiser input is ``Re(z - u)``, the FFT input is the real
    denoiser output, observations/rewards use ``x.real``), so carrying it
    was pure zero traffic — ~1/6 of the x/z/u scan-carry and DeviceMCTS
    node-snapshot bytes, the search's dominant HBM cost (VERDICT r3
    item 5). ``x_real`` is kept as the accessor surface.
    """
    x: jnp.ndarray      # (B, 1, H, W) float32 — current estimate (real)
    z: jnp.ndarray      # (B, 1, H, W, 2) float32 — split variable (ri)
    u: jnp.ndarray      # (B, 1, H, W, 2) float32 — scaled dual (ri)
    mask: jnp.ndarray   # (B, 1, H, W) bool — k-space sampling mask
    y0: jnp.ndarray     # (B, 1, H, W, 2) float32 — measured k-space (ri)
    gt: jnp.ndarray     # (B, 1, H, W) float32 — ground truth
    T: jnp.ndarray      # (B,) float32 — normalized step counter
    done: jnp.ndarray   # (B,) bool — episode termination mask

    @property
    def batch(self) -> int:
        return self.x.shape[0]

    @property
    def x_real(self) -> jnp.ndarray:
        """(B, 1, H, W) real current estimate (alias of ``x``)."""
        return self.x


Action = Mapping[str, jnp.ndarray]  # keys: 'T', 'mu', 'sigma_d'

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# (B, H, W, 1) image, (B,) sigma -> (B, H, W, 1) denoised


def reset_from_mat(mat: Mapping[str, Any], image_size: Optional[int] = None
                   ) -> CSMRIState:
    """Build the initial state from a .mat record dict with keys
    x0, y0 (.., H, W, 2 real/imag), mask (.., H, W), gt (.., H, W)
    (reference env.py:57-71; ``ATy0`` is carried but unused by the loop, so
    it is dropped here). Any leading batch dims collapse into one.
    ``image_size`` defaults to the record's own (square) geometry, read
    from the mask's trailing axis — the reference hardcodes 128."""
    s = int(image_size) if image_size else int(
        np.asarray(mat["mask"]).shape[-1])

    def ri(arr):
        return jnp.asarray(arr, jnp.float32).reshape(-1, 1, s, s, 2)

    x0 = ri(mat["x0"])  # z keeps the record's full ri pair; x is real-only
    y0 = ri(mat["y0"])
    mask = jnp.asarray(mat["mask"]).reshape(-1, 1, s, s).astype(bool)
    gt = jnp.asarray(mat["gt"], jnp.float32).reshape(-1, 1, s, s)
    b = x0.shape[0]
    return CSMRIState(
        x=x0[..., 0], z=x0, u=jnp.zeros_like(x0), mask=mask, y0=y0, gt=gt,
        T=jnp.zeros((b,), jnp.float32), done=jnp.zeros((b,), bool))


def _per_slice(value, b: int) -> jnp.ndarray:
    """Broadcast an action component (scalar or per-slice) to shape (B,)."""
    return jnp.broadcast_to(
        jnp.asarray(value, jnp.float32).reshape(-1), (b,))


def admm_step(denoise: DenoiseFn, state: CSMRIState, action: Action,
              done_threshold: float = 0.5,
              use_pallas: bool = False) -> CSMRIState:
    """One masked PnP-ADMM iteration. Where ``done`` (or the stop action
    ``T > 0.5`` fires, env.py:79-83) the slice is frozen instead of
    early-returned, so the step is batch-uniform and scan-able."""
    b = state.batch
    t_act = _per_slice(action["T"], b)
    mu = _per_slice(action["mu"], b)
    sigma_d = _per_slice(action["sigma_d"], b)

    stop_now = t_act > done_threshold
    active = ~(state.done | stop_now)

    # Denoiser runs in NHWC (TPU conv layout); state is (B, 1, H, W, 2).
    img = state.z[..., 0] - state.u[..., 0]
    den = denoise(jnp.moveaxis(img, 1, -1), sigma_d)
    x_real = jnp.moveaxis(den, -1, 1)

    u_c = to_complex(state.u)
    z_k = fft2c(x_real.astype(jnp.complex64) + u_c)
    if use_pallas:
        from dt4image_restoration_tpu.ops.pallas import (
            kspace_consistency_pallas)
        z_k = to_complex(kspace_consistency_pallas(
            from_complex(z_k), state.y0, state.mask, mu))
    else:
        z_k = kspace_consistency(z_k, to_complex(state.y0), state.mask,
                                 mu[:, None, None, None])
    z_c = ifft2c(z_k)
    u_c = u_c + x_real - z_c

    z_new = from_complex(z_c)
    u_new = from_complex(u_c)

    keep4 = active[:, None, None, None]
    keep5 = keep4[..., None]
    return state.replace(
        x=jnp.where(keep4, x_real, state.x),
        z=jnp.where(keep5, z_new, state.z),
        u=jnp.where(keep5, u_new, state.u),
        T=jnp.where(active, state.T + 1.0 / 30.0, state.T),
        done=state.done | stop_now)


def compute_reward(state: CSMRIState) -> jnp.ndarray:
    """PSNR of the current estimate vs ground truth, (B, 1)
    (env.py:112-116). Stays on device — no host transfer in the hot loop."""
    return psnr(state.x_real, state.gt)


def get_policy_ob(state: CSMRIState) -> jnp.ndarray:
    """Flattened real part of x, (B, H*W) (env.py:102-109)."""
    return state.x_real.reshape(state.batch, -1)


def fixed_param_rollout(denoise: DenoiseFn, state: CSMRIState,
                        mu: float, sigma_d: float, n_iters: int = 30,
                        use_pallas: bool = False
                        ) -> Tuple[CSMRIState, jnp.ndarray]:
    """Fixed-parameter PnP-ADMM: ``n_iters`` iterations in one lax.scan.

    This is BASELINE.json config 1 (the minimum end-to-end slice) and the
    headline-bench inner loop. Returns the final state and per-iteration
    PSNR history (n_iters, B, 1).
    """
    action = {"T": jnp.zeros((state.batch,)), "mu": jnp.asarray(mu),
              "sigma_d": jnp.asarray(sigma_d)}

    def body(s, _):
        s = admm_step(denoise, s, action, use_pallas=use_pallas)
        return s, compute_reward(s)

    return jax.lax.scan(body, state, None, length=n_iters)


@dataclasses.dataclass
class PnPEnv:
    """Convenience OO wrapper bundling the denoiser apply fn + params,
    mirroring the reference's class surface (env.py:30-117) on top of the
    pure functions above."""
    denoiser_apply: Callable
    denoiser_params: Any
    max_episode_step: int = 30
    image_size: Optional[int] = None  # None = infer from each record

    def denoise(self, img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        return self.denoiser_apply({"params": self.denoiser_params}, img,
                                   sigma)

    def reset(self, mat: Mapping[str, Any]) -> CSMRIState:
        return reset_from_mat(mat, self.image_size)

    def step(self, state: CSMRIState, action: Action
             ) -> Tuple[CSMRIState, jnp.ndarray]:
        new = admm_step(self.denoise, state, action)
        return new, new.done

    @staticmethod
    def get_policy_ob(state: CSMRIState) -> jnp.ndarray:
        return get_policy_ob(state)

    @staticmethod
    def compute_reward(state: CSMRIState) -> jnp.ndarray:
        return compute_reward(state)
