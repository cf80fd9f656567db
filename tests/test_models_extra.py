import jax
import jax.numpy as jnp
import pytest

from centertrack_tpu.models.model import CenterTrackNet


def _net(**kw):
    kw.setdefault("heads", (("hm", 1), ("reg", 2)))
    kw.setdefault("head_convs", (("hm", (16,)), ("reg", (16,))))
    return CenterTrackNet(**kw)


@pytest.mark.parametrize("backbone,neck", [
    ("mobilenet", "dlaup"),
    ("resnet", "msraup"),
    ("dla34", "dlaup"),
])
def test_generic_network(backbone, neck):
    net = _net(arch="generic", backbone=backbone, neck=neck,
               num_layers=18, dla_node="conv")
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(v, x)
    assert out[0]["hm"].shape == (1, 16, 16, 1)


def test_dlav0():
    net = _net(arch="dlav0", num_layers=34)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(v, x)
    assert out[0]["hm"].shape == (1, 16, 16, 1)


def test_mobilenet_temporal_stems():
    net = _net(arch="generic", backbone="mobilenet", neck="dlaup",
               dla_node="conv", with_pre_img=True, with_pre_hm=True)
    x = jnp.zeros((1, 32, 32, 3))
    hm = jnp.zeros((1, 32, 32, 1))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, hm)
    out = jax.jit(net.apply)(v, x, x, hm)
    assert out[0]["hm"].shape == (1, 8, 8, 1)
