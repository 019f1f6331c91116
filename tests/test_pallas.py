"""Pallas kernel tests — interpreter mode on CPU (SURVEY.md §4.4: interpret
mode is the kernel sanitizer; compiled execution is exercised on the real
chip by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinaural.config import RenderConfig
from tinaural.models import BinauralRenderer
from tinaural.ops.pallas_kernels import fused_spectral_mac
from tinaural.reference import golden

from conftest import snr_db


def test_fused_spectral_mac_matches_jnp(rng):
    nb, F = 6, 1025
    mk = lambda *s: (rng.standard_normal(s) + 1j * rng.standard_normal(s)).astype(
        np.complex64)
    Xu, Xd = mk(nb, F), mk(nb, F)
    Hc, Hp = mk(nb, 2, F), mk(nb, 2, F)
    want = Xu[:, None, :] * Hc + Xd[:, None, :] * Hp
    got = fused_spectral_mac(jnp.asarray(Xu), jnp.asarray(Xd), jnp.asarray(Hc),
                             jnp.asarray(Hp), interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_trajectory_with_pallas_kernel(table, rng):
    """Full trajectory render through the kernel vs the golden oracle."""
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    x = rng.standard_normal(1500)
    nb = -(-1500 // 256)
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 60, nb)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(table, x, dirs,
                                   RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60


def test_scene_with_pallas_kernel(table, rng):
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    xs = rng.standard_normal((3, 700))
    dirs = np.stack([rng.uniform(0, 360, 3), rng.uniform(-40, 90, 3)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_scene(xs, dirs))
    ref = golden.render_scene(table, xs, dirs, RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60
