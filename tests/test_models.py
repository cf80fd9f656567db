import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centertrack_tpu.models.model import (CenterTrackNet, create_model,
                                          init_model, save_model, load_model)


def _tiny_net(arch="dla", num_layers=34, node="conv", pre=False):
    return CenterTrackNet(
        arch=arch, num_layers=num_layers,
        heads=(("hm", 2), ("reg", 2), ("wh", 2), ("tracking", 2)),
        head_convs=(("hm", (32,)), ("reg", (32,)), ("wh", (32,)),
                    ("tracking", (32,))),
        dla_node=node, with_pre_img=pre, with_pre_hm=pre)


@pytest.fixture(scope="module")
def dla_conv():
    """One dla34/conv build + init + compiled apply shared by every
    test that only inspects outputs (compile dominates CPU test time)."""
    net = _tiny_net(node="conv")
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    apply = jax.jit(net.apply)
    out = apply(variables, x)
    return net, x, variables, out, apply


def test_dla34_shapes_conv_node(dla_conv):
    out = dla_conv[3]
    assert isinstance(out, list) and len(out) == 1
    assert set(out[0].keys()) == {"hm", "reg", "wh", "tracking"}
    assert out[0]["hm"].shape == (1, 8, 8, 2)
    assert out[0]["wh"].shape == (1, 8, 8, 2)


def test_dla34_dcn_node_and_temporal_inputs():
    net = _tiny_net(node="dcn", pre=True)
    x = jnp.zeros((1, 32, 32, 3))
    pre_img = jnp.ones((1, 32, 32, 3))
    pre_hm = jnp.zeros((1, 32, 32, 1))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, pre_img, pre_hm)
    out = jax.jit(net.apply)(variables, x, pre_img, pre_hm)
    assert out[0]["hm"].shape == (1, 8, 8, 2)
    # temporal stems must change the output
    out2 = jax.jit(net.apply)(variables, x, pre_img * 0, pre_hm)
    assert not np.allclose(np.asarray(out[0]["hm"]),
                           np.asarray(out2[0]["hm"]))


def test_hm_prior_bias(dla_conv):
    out = dla_conv[3]
    # hm starts near prior_bias=-4.6 logits -> sigmoid ~ 0.01
    hm_sig = jax.nn.sigmoid(out[0]["hm"])
    assert float(hm_sig.mean()) < 0.1


def test_resnet18_shapes():
    net = _tiny_net(arch="res", num_layers=18)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(variables, x)
    assert out[0]["hm"].shape == (1, 16, 16, 2)


def test_resdcn18_shapes():
    net = _tiny_net(arch="resdcn", num_layers=18)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(variables, x)
    assert out[0]["hm"].shape == (1, 16, 16, 2)


def test_create_model_arch_parse():
    m = create_model("dla_34", {"hm": 1, "reg": 2, "wh": 2},
                     {"hm": (256,), "reg": (256,), "wh": (256,)})
    assert m.arch == "dla" and m.num_layers == 34


def test_save_load_roundtrip(tmp_path, dla_conv):
    net, x, variables, out1, apply = dla_conv
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    p = str(tmp_path / "model.ckpt")
    save_model(p, 7, params, bs)
    loaded = load_model(p, params, bs)
    assert loaded["epoch"] == 7
    out2 = apply({"params": loaded["params"],
                  "batch_stats": loaded["batch_stats"]}, x)
    np.testing.assert_allclose(np.asarray(out1[0]["hm"]),
                               np.asarray(out2[0]["hm"]))


def test_batchnorm_train_mode_updates_stats(dla_conv):
    net, _, variables, _, _ = dla_conv
    x = jnp.ones((1, 32, 32, 3))
    out, mutated = jax.jit(
        lambda v, x: net.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    flat_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    flat_new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_old, flat_new))
    assert changed
