"""Bitwise run-to-run determinism of the grounding loss+grad on the
REAL chip (the on-hardware half of tests/test_determinism.py — the
reference's float-atomic p2g cannot provide this on GPU; SURVEY.md
section 5.2). Runs the headline bench scenario's jitted loss+grad
three times (twice on one executable, once re-jitted) and asserts
exact equality of every output bit.
"""
import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from neuma_tpu.train.grounding import make_rollout_loss

p = dict(bench.SCENARIOS["headline"])
p.update(frames=2)
scene = bench.build_scene(p)
loss_fn = make_rollout_loss(scene)
weights = jnp.ones(p["frames"], jnp.float32)
iv = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
pe, pp = scene.elasticity_params, scene.plasticity_params


def f(pe, pp, iv):
    return loss_fn(pe, pp, iv, weights)[0]


def check(tag, a, b):
    la, lb = map(jax.tree_util.tree_leaves, (a, b))
    bad = 0
    for x, y in zip(la, lb):
        xa = np.ascontiguousarray(np.atleast_1d(np.asarray(x)))
        ya = np.ascontiguousarray(np.atleast_1d(np.asarray(y)))
        if not np.array_equal(xa.view(np.uint8), ya.view(np.uint8)):
            bad += 1
    print(f"[determinism:{tag}] leaves={len(la)} bitwise-mismatched={bad}")
    return bad


g1 = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
a = jax.device_get(g1(pe, pp, iv))
b = jax.device_get(g1(pe, pp, iv))
g2 = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
c = jax.device_get(g2(pe, pp, iv))
n_bad = check("same-executable", a, b) + check("re-jitted", a, c)
print(f"loss={float(a[0]):.7f} backend={jax.default_backend()}")
assert n_bad == 0, "run-to-run bitwise determinism violated"
print("OK: bitwise deterministic on", jax.default_backend())
