"""Trainer behavior: convergence handled by tools/selftest; here the
mechanics — lr schedule, grad_checkpoint parity, optimizer switch."""

import numpy as np
import jax
import jax.numpy as jnp

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.engine.trainer import Trainer, make_lr_schedule
from centertrack_tpu.models.model import create_model, init_model
from centertrack_tpu.parallel.mesh import make_mesh, shard_batch


class Meta:
    num_categories = 1
    default_resolution = (32, 32)
    num_joints = 17


def tiny_batch(b=2, m=4):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randn(b, 32, 32, 3).astype(np.float32),
        "pre_img": rng.randn(b, 32, 32, 3).astype(np.float32),
        "ind": np.zeros((b, m), np.int64),
        "cat": np.zeros((b, m), np.int64),
        "mask": np.ones((b, m), np.float32),
        "hm_cts": np.full((b, m, 2), 3, np.int32),
        "hm_radii": np.ones((b, m), np.int32),
        "hm_valid": np.ones((b, m), bool),
        "ignore_boxes": np.zeros((b, 2, 4), np.float32),
        "ignore_cat": np.zeros((b, 2), np.int32),
        "ignore_valid": np.zeros((b, 2), bool),
        "pre_cts_int": np.full((b, 2 * m, 2), 8, np.int32),
        "pre_radii": np.ones((b, 2 * m), np.int32),
        "pre_ks": np.ones((b, 2 * m), np.float32),
        "pre_valid": np.ones((b, 2 * m), bool),
        "reg": np.zeros((b, m, 2), np.float32),
        "reg_mask": np.ones((b, m, 2), np.float32),
        "wh": np.ones((b, m, 2), np.float32),
        "wh_mask": np.ones((b, m, 2), np.float32),
        "tracking": np.zeros((b, m, 2), np.float32),
        "tracking_mask": np.ones((b, m, 2), np.float32),
    }


def make_trainer(n_devices=1, batch_size=2, **cfg_kw):
    # the mechanics under test (remat, sharding, optimizers, lr) are
    # arch-agnostic; the tiny-backbone generic net keeps the PRODUCTION
    # DLAUp neck + heads + loss graph at a small fraction of full
    # backbone compile cost (test_models pins the real archs)
    cfg_kw.setdefault("dla_node", "conv")
    cfg_kw.setdefault("arch", "generic")
    cfg_kw.setdefault("backbone", "tiny")
    cfg_kw.setdefault("neck", "dlaup")
    cfg = Config(task="tracking", pre_hm=True, batch_size=batch_size,
                 num_devices=n_devices, **cfg_kw)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, Meta)
    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, bs = init_model(model, cfg)
    return Trainer(cfg, model, params, bs, mesh=make_mesh(n_devices)), cfg


def test_lr_schedule():
    cfg = parse_task(Config(task="", lr=1e-3, lr_step=(3, 5)))
    lr = make_lr_schedule(cfg)
    assert lr(1) == 1e-3
    np.testing.assert_allclose(lr(3), 1e-4)
    np.testing.assert_allclose(lr(5), 1e-5)


def test_grad_checkpoint_matches_plain():
    # pin matmul precision: the default fast-matmul mode rounds
    # differently across the remat/no-remat fusion variants
    with jax.default_matmul_precision("float32"):
        t_plain, cfg = make_trainer(grad_checkpoint=False, seed=1)
        t_remat, _ = make_trainer(grad_checkpoint=True, seed=1)
        batch = tiny_batch()
        sp = shard_batch(batch, t_plain.mesh)
        s1, l1 = t_plain._train_step(t_plain.state, sp, 1e-4)
        s2, l2 = t_remat._train_step(t_remat.state, sp, 1e-4)
        # XLA-CPU's oneDNN matmul rewrite ignores the precision config,
        # so the remat/no-remat fusion variants round differently; the
        # check here is semantic (same loss to ~1%, finite grads, params
        # move the same way), exact parity is verified eagerly in
        # test_remat_forward_identical.
        np.testing.assert_allclose(float(l1["tot"]), float(l2["tot"]),
                                   rtol=0.05)
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_remat_forward_identical():
    # eager evaluation: remat wrapper must not change forward values
    t_plain, _ = make_trainer(grad_checkpoint=False, seed=1)
    t_remat, _ = make_trainer(grad_checkpoint=True, seed=1)
    batch = tiny_batch()
    l1, _ = t_plain._forward_loss(
        t_plain.state.params, t_plain.state.batch_stats, batch, True)
    l2, _ = t_remat._forward_loss(
        t_remat.state.params, t_remat.state.batch_stats, batch, True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_multichip_matches_single_device_and_replicates():
    """One compiled 8-device step proves three properties at once
    (reference parallelism being matched:
    src/lib/model/data_parallel.py:64-128):

      1. the sharded step runs on the full 8-device CPU mesh and the
         loss is finite;
      2. 8-device data-parallel loss == 1-device loss on the same
         global batch, and the updated params agree — the mesh changes
         *where* compute runs, never *what* is computed;
      3. after the step every device holds bitwise-identical params
         (the gradient all-reduce leaves the replicas in lockstep).
    """
    assert jax.device_count() >= 8, "conftest must provision 8 devices"
    with jax.default_matmul_precision("float32"):
        t1, _ = make_trainer(n_devices=1, batch_size=8, seed=3)
        t8, _ = make_trainer(n_devices=8, batch_size=8, seed=3)
        batch = tiny_batch(b=8)
        s1, l1 = t1._train_step(t1.state, shard_batch(batch, t1.mesh), 1e-4)
        s8, l8 = t8._train_step(t8.state, shard_batch(batch, t8.mesh), 1e-4)
        assert np.isfinite(float(l8["tot"]))
        np.testing.assert_allclose(float(l1["tot"]), float(l8["tot"]),
                                   rtol=1e-5)
        # Adam normalizes each grad by sqrt(v): for near-zero grads the
        # reduction-order float noise of the 8-way all-reduce can flip a
        # sign, moving that weight by +/-lr instead of -/+lr. Bound the
        # drift at 3*lr absolute (lr=1e-4 here); systematic divergence
        # would blow far past this.
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=3e-4)
        # replication: every device holds bitwise-identical params
        checked = 0
        for leaf in jax.tree_util.tree_leaves(s8.params)[:8]:
            shards = leaf.addressable_shards
            assert len(shards) == 8, \
                f"param not on all devices: {len(shards)}"
            ref = np.asarray(shards[0].data)
            for sh in shards[1:]:
                np.testing.assert_array_equal(ref, np.asarray(sh.data))
            checked += 1
        assert checked > 0


import pytest


@pytest.mark.parametrize("node", ["dcn", "dcn_local1"])
def test_multichip_real_nodes_match_single_device(node):
    """The production DCN node types (exact gather `dcn` and the clamped
    `dcn_local1` fast path) under pjit sharding: 8-device data-parallel
    loss equals the 1-device loss and the replicas stay in lockstep.
    Complements test_multichip_matches_single_device_and_replicates,
    which covers the graph structure with the cheap `conv` node
    (reference parallelism: src/lib/model/data_parallel.py:64-128 over
    the DCN models built at src/lib/model/networks/dla.py:506-518)."""
    assert jax.device_count() >= 8, "conftest must provision 8 devices"
    with jax.default_matmul_precision("float32"):
        # tiny backbone + DLAUp neck: the neck instantiates the SAME
        # DeformNode modules as dla_34 but compiles far faster on the
        # 1-core CI box. Only the 8-device step is compiled; the
        # 1-device reference loss comes from an eager forward.
        t8, _ = make_trainer(n_devices=8, batch_size=8, seed=5,
                             dla_node=node)
        batch = tiny_batch(b=8)
        ref_loss, _ = t8._forward_loss(
            jax.device_get(t8.state.params),
            jax.device_get(t8.state.batch_stats), batch, True)
        s8, l8 = t8._train_step(t8.state, shard_batch(batch, t8.mesh),
                                1e-4)
        assert np.isfinite(float(l8["tot"]))
        np.testing.assert_allclose(float(ref_loss), float(l8["tot"]),
                                   rtol=1e-5)
        leaf = jax.tree_util.tree_leaves(s8.params)[0]
        shards = leaf.addressable_shards
        assert len(shards) == 8
        ref = np.asarray(shards[0].data)
        for sh in shards[1:]:
            np.testing.assert_array_equal(ref, np.asarray(sh.data))


def test_grad_accum_matches_monolithic():
    """cfg.grad_accum=2 on a duplicated batch [mb; mb] must produce the
    same optimizer update as one monolithic step on the same batch:
    per-micro BN statistics over mb equal the full-batch statistics
    over the duplicate, each micro gradient equals the full-batch
    gradient, and the fp32-accumulated average is that same gradient.
    (The envelope this enables: effective B=16/32 per chip past the
    B=16 monolithic compile failure, docs/train_bench.json; reference
    trains MOT17 at batch 32, readme/MODEL_ZOO.md:16-20.)"""
    with jax.default_matmul_precision("float32"):
        t_mono, _ = make_trainer(batch_size=4, seed=7)
        t_acc, _ = make_trainer(batch_size=4, seed=7, grad_accum=2)
        assert t_acc.accum == 2
        mb = tiny_batch(b=2)
        batch = {k: np.concatenate([v, v], axis=0)
                 for k, v in mb.items()}
        s_mono, l_mono = t_mono._train_step(
            t_mono.state, shard_batch(batch, t_mono.mesh), 1e-4)
        l_acc = t_acc._train_step_accum(batch, 1e-4)
        s_acc = t_acc.state
        np.testing.assert_allclose(float(l_mono["tot"]),
                                   float(l_acc["tot"]), rtol=1e-5)
        assert int(s_acc.step) == 1
        # same Adam caveat as the multichip test: near-zero grads can
        # flip sign under reduction-order noise; bound drift at 3*lr
        for a, b in zip(jax.tree_util.tree_leaves(s_mono.params),
                        jax.tree_util.tree_leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=3e-4)


def test_grad_accum_epoch_runs():
    """run_epoch routes train batches through the accumulating path and
    rejects indivisible batches loudly."""
    t, _ = make_trainer(batch_size=4, seed=9, grad_accum=2)
    batch = tiny_batch(b=4)
    losses = t._train_step_accum(batch, 1e-4)
    assert np.isfinite(float(losses["tot"]))
    bad = tiny_batch(b=3)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="grad_accum"):
        t._train_step_accum(bad, 1e-4)


def test_sgd_optimizer():
    t, cfg = make_trainer(optim="sgd")
    batch = tiny_batch()
    sp = shard_batch(batch, t.mesh)
    s, losses = t._train_step(t.state, sp, 1e-3)
    assert np.isfinite(float(losses["tot"]))
