"""Scheduler and per-group gradient-accumulation tests.

Reference semantics: ``engine/schedulers.py`` (MultiStepScheduler at :77,
ExponentialDecayScheduler at :109, CosineDecayScheduler at :158) and
``engine/trainer.py:451-466`` (gradient_accumulation_steps: a group with
accumulation N averages N grads and applies one update every N steps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from gstex_tpu.data.synthetic import random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train.optim import (
    OptimConfig,
    cosine_decay_schedule,
    exp_decay_schedule,
    make_optimizer,
    multi_step_schedule,
)


def test_exp_decay_endpoints_and_warmup():
    fn = exp_decay_schedule(1e-2, 1e-4, 100)
    assert np.isclose(float(fn(0)), 1e-2)
    assert np.isclose(float(fn(100)), 1e-4)
    assert np.isclose(float(fn(50)), 1e-3)          # log-space midpoint
    # warmup: 0 at step 0, full lr_init at warmup end, then decays
    fw = exp_decay_schedule(1e-2, 1e-4, 100, warmup_steps=10)
    assert float(fw(0)) == 0.0
    assert np.isclose(float(fw(10)), 1e-2)
    assert np.isclose(float(fw(100)), 1e-4)
    flin = exp_decay_schedule(1e-2, 1e-4, 100, warmup_steps=10, ramp="linear")
    assert np.isclose(float(flin(5)), 5e-3)


def test_multi_step_schedule():
    fn = multi_step_schedule(1.0, milestones=(10, 20), gamma=0.5)
    assert float(fn(jnp.asarray(5))) == 1.0
    assert float(fn(jnp.asarray(10))) == 0.5
    assert float(fn(jnp.asarray(25))) == 0.25


def test_cosine_decay_schedule():
    fn = cosine_decay_schedule(1.0, 0.0, 100, warmup_steps=10)
    assert float(fn(0)) == 0.0
    assert np.isclose(float(fn(10)), 1.0)
    assert np.isclose(float(fn(100)), 0.0, atol=1e-6)
    assert np.isclose(float(fn(55)), 0.5, atol=1e-2)  # cosine midpoint


def _tiny_params():
    cfg = model.GStexConfig(chart_pad=(8, 8), pixel_num=500)
    scene = random_scene(jax.random.key(0), 8, chart_pad=cfg.chart_pad)
    params, _ = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"])
    return cfg, params


@pytest.mark.slow
def test_grad_accumulation_updates_every_k():
    """texture group with accumulation 2: updates land every 2nd step and
    equal one Adam step on the mean grad; other groups update every step."""
    cfg, params = _tiny_params()
    ocfg = OptimConfig(max_steps=10,
                       gradient_accumulation=(("texture_dc", 2),))
    opt = make_optimizer(ocfg)
    state = opt.init(params)

    def grads_like(p, scale):
        return jax.tree.map(lambda x: jnp.full_like(x, scale), p)

    p = params
    tex0 = p.texture
    # step 1: texture must NOT move (accumulating), means must move
    u, state = opt.update(grads_like(p, 1.0), state, p)
    p1 = optax.apply_updates(p, u)
    assert np.allclose(np.asarray(p1.texture), np.asarray(tex0))
    assert not np.allclose(np.asarray(p1.means), np.asarray(p.means))
    # step 2: texture moves now
    u, state = opt.update(grads_like(p1, 1.0), state, p1)
    p2 = optax.apply_updates(p1, u)
    assert not np.allclose(np.asarray(p2.texture), np.asarray(tex0))


def test_grad_accumulation_mean_matches_plain_adam():
    """Constant grads: MultiSteps(k=2) after 2 micro-steps == 1 plain Adam
    step on the same grad (mean of equal grads is the grad)."""
    cfg, params = _tiny_params()
    acc = make_optimizer(OptimConfig(gradient_accumulation=(("texture_dc", 2),)))
    plain = make_optimizer(OptimConfig())
    g = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, params)

    sa = acc.init(params)
    pa = params
    for _ in range(2):
        u, sa = acc.update(g, sa, pa)
        pa = optax.apply_updates(pa, u)

    sp = plain.init(params)
    u, sp = plain.update(g, sp, params)
    pp = optax.apply_updates(params, u)
    np.testing.assert_allclose(np.asarray(pa.texture), np.asarray(pp.texture),
                               rtol=1e-6)
