"""Differentiable HRTF personalization: single-device and sharded fitting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tinaural.config import RenderConfig
from tinaural.models import BinauralRenderer
from tinaural.models.fit import (FitParams, fit_hrtf, init_params,
                                 personalize_table, scene_loss)
from tinaural.reference import golden

from conftest import snr_db

CFG = RenderConfig(block_size=256)


def _scene_inputs(seed, S=2, N=768):
    # own generator: the session rng fixture's state depends on test order,
    # which would make loss-threshold assertions order-dependent
    rng = np.random.default_rng(seed)
    xs = rng.standard_normal((S, N)).astype(np.float32)
    dirs = np.stack([rng.uniform(0, 360, S), rng.uniform(-40, 90, S)], axis=1)
    return xs, dirs


def test_identity_params_are_identity(table, rng):
    p = init_params()
    t2 = personalize_table(jax.device_put(table), p)
    np.testing.assert_allclose(np.asarray(t2.delays), np.asarray(table.delays),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2.gains), np.asarray(table.gains),
                               rtol=1e-5)
    assert snr_db(np.asarray(table.h), np.asarray(t2.h)) > 100


def test_fit_recovers_global_gain(table, rng):
    """Target rendered 6 dB hot; the fitted render must match it.

    (Gain, ILD and EQ are deliberately over-complete — a global gain can
    live in either gain_log or the EQ — so the assertion is on the fitted
    *render*, not on parameter identifiability.)
    """
    xs, dirs = _scene_inputs(7)
    true = init_params()._replace(gain_log=jnp.asarray(np.log(2.0), jnp.float32))
    ttab = personalize_table(jax.device_put(table), true)
    target = np.asarray(
        BinauralRenderer(jax.tree.map(np.asarray, ttab), CFG).render_scene(xs, dirs))
    params, losses = fit_hrtf(table, xs, dirs, target, steps=60,
                              lr=5e-2, config=CFG)
    assert losses[-1] < losses[0] * 1e-2
    fitted_tab = jax.tree.map(np.asarray,
                              personalize_table(jax.device_put(table), params))
    y = np.asarray(BinauralRenderer(fitted_tab, CFG).render_scene(xs, dirs))
    assert snr_db(target, y) > 25


def test_fit_reduces_loss_on_itd_ild_perturbation(table, rng):
    xs, dirs = _scene_inputs(7)
    true = init_params()._replace(
        itd_scale_log=jnp.asarray(0.2, jnp.float32),
        ild_scale_log=jnp.asarray(0.3, jnp.float32))
    ttab = personalize_table(jax.device_put(table), true)
    target = BinauralRenderer(jax.tree.map(np.asarray, ttab), CFG).render_scene(xs, dirs)
    # gradients must flow to every parameter through the full render
    B = CFG.block_size
    nb = -(-xs.shape[1] // B)
    xbs = jnp.asarray(np.pad(xs, [(0, 0), (0, nb * B - xs.shape[1])]).reshape(
        xs.shape[0], nb, B))
    dirs_b = jnp.asarray(np.broadcast_to(
        dirs[:, None, :], (xs.shape[0], nb, 2)).astype(np.float32))
    g = jax.grad(scene_loss)(init_params(), jax.device_put(table), xbs, dirs_b,
                             jnp.asarray(np.asarray(target, np.float32)), CFG)
    for name, leaf in zip(FitParams._fields, g):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)), name
        assert np.any(arr != 0), f"no gradient reached {name}"

    params, losses = fit_hrtf(table, xs, dirs, np.asarray(target), steps=80,
                              lr=3e-2, config=CFG)
    # ITD enters through round()+frac (piecewise gradient), so the loss
    # surface is bumpy and convergence slow; the property under test is
    # that optimization makes real progress, not optimizer strength.
    assert losses[-1] < losses[0] * 0.8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fit_step_matches_single_device(table, rng):
    """Data-parallel grads through psum == single-device grads."""
    from tinaural.parallel import make_mesh, scene_loss_sharded

    B = CFG.block_size
    xs, dirs = _scene_inputs(8, S=8, N=512)
    nb = 2
    xbs = jnp.asarray(xs.reshape(8, nb, B))
    dirs_b = jnp.asarray(
        np.broadcast_to(dirs[:, None, :], (8, nb, 2)).astype(np.float32))
    target = jnp.zeros((2, 512), jnp.float32)
    params = init_params()
    tbl = jax.device_put(table)

    mesh = make_mesh((8, 1))
    l_sharded = scene_loss_sharded(params, tbl, xbs, dirs_b, target, CFG, mesh)
    l_single = scene_loss(params, tbl, xbs, dirs_b, target, CFG)
    np.testing.assert_allclose(float(l_sharded), float(l_single), rtol=1e-4)

    g_sharded = jax.grad(scene_loss_sharded)(params, tbl, xbs, dirs_b, target,
                                             CFG, mesh)
    g_single = jax.grad(scene_loss)(params, tbl, xbs, dirs_b, target, CFG)
    for a, b in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fit_loss_pads_sources(table, rng):
    """Source count not divisible by the shard count zero-pads exactly
    (a silent source is zero loss AND zero gradient — the render is
    linear in the audio), matching render_scene_sharded's convention
    instead of shard_map's low-level trace error."""
    from tinaural.parallel import make_mesh, scene_loss_sharded

    B = CFG.block_size
    xs, dirs = _scene_inputs(8, S=5, N=512)  # 5 sources on 8 shards
    nb = 2
    xbs = jnp.asarray(xs.reshape(5, nb, B))
    dirs_b = jnp.asarray(
        np.broadcast_to(dirs[:, None, :], (5, nb, 2)).astype(np.float32))
    target = jnp.zeros((2, 512), jnp.float32)
    params = init_params()
    tbl = jax.device_put(table)
    mesh = make_mesh((8, 1))
    l_sharded = scene_loss_sharded(params, tbl, xbs, dirs_b, target, CFG,
                                   mesh)
    l_single = scene_loss(params, tbl, xbs, dirs_b, target, CFG)
    np.testing.assert_allclose(float(l_sharded), float(l_single), rtol=1e-4)
    g_sharded = jax.grad(scene_loss_sharded)(params, tbl, xbs, dirs_b,
                                             target, CFG, mesh)
    g_single = jax.grad(scene_loss)(params, tbl, xbs, dirs_b, target, CFG)
    for a, b in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-6)
