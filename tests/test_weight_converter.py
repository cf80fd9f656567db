"""Round-trip test: fabricate a reference-style state_dict shaped like
the real DLA-34 checkpoint, convert it, and check the resulting tree
matches our model's init tree exactly (structure + shapes), with values
surviving the layout transposes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centertrack_tpu.models.model import CenterTrackNet
from centertrack_tpu.tools.convert_torch_weights import convert_dla34


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _fake_state_dict(params, stats):
    """Inverse of the converter's mapping: flax tree -> torch names."""
    flat_p = _flatten(params)
    flat_s = _flatten(stats)
    sd = {}

    def inv_conv(w):
        return np.transpose(w, (3, 2, 0, 1))

    def inv_up(w):
        return np.transpose(w, (3, 2, 0, 1))

    def inv_offset_w(w):
        # upstream offset/mask channel order == ours (identity)
        return inv_conv(w)

    def inv_offset_b(b):
        return b

    def torch_name(path):
        p = path.replace("backbone/base/", "base.")
        p = p.replace("backbone/", "")
        p = p.replace("heads/", "")
        return p

    for path, w in flat_p.items():
        t = torch_name(path)
        if path.startswith("heads/"):
            # heads/hm/conv_0/kernel -> hm.0.weight ; out -> last index
            parts = path.split("/")
            head, layer, leaf = parts[1], parts[2], parts[3]
            n_convs = len({pp.split("/")[2] for pp in flat_p
                           if pp.startswith(f"heads/{head}/")
                           and pp.split("/")[2] != "out"})
            idx = (int(layer.split("_")[1]) * 2 if layer != "out"
                   else n_convs * 2)
            name = f"{head}.{idx}." + ("weight" if leaf == "kernel"
                                       else "bias")
            sd[name] = inv_conv(w) if leaf == "kernel" else w
            continue
        if "/conv_offset_mask/" in path:
            base = t.replace("/conv_offset_mask/kernel",
                             ".conv_offset_mask.weight").replace(
                "/conv_offset_mask/bias", ".conv_offset_mask.bias")
            base = base.replace("/conv", ".conv").replace("/", ".")
            sd[base] = (inv_offset_w(w) if path.endswith("kernel")
                        else inv_offset_b(w))
            continue
        if path.endswith("up_1/kernel") or path.endswith("up_2/kernel") \
                or path.endswith("up_3/kernel"):
            sd[t.replace("/kernel", ".weight").replace("/", ".")] = \
                inv_up(w)
            continue
        name = t.replace("/", ".")
        if name.endswith(".kernel"):
            sd[name.replace(".kernel", ".weight")] = inv_conv(w)
        elif name.endswith(".scale"):
            sd[name.replace(".scale", ".weight")] = w
        else:
            sd[name] = w
    for path, v in flat_s.items():
        name = torch_name(path).replace("/", ".")
        name = name.replace(".mean", ".running_mean").replace(
            ".var", ".running_var")
        sd[name] = v

    # rename flax module paths to the reference naming
    renamed = {}
    for k, v in sd.items():
        kk = k
        kk = kk.replace(".bn.weight", "#BNW#").replace(
            ".bn.bias", "#BNB#").replace(
            ".bn.running_mean", "#BNM#").replace(
            ".bn.running_var", "#BNV#")
        # ConvBNAct: base_layer.conv.weight -> base_layer.0.weight etc
        kk = kk.replace(".conv.weight", "#CW#")
        for tag, rep in [("#CW#", ".0.weight"), ("#BNW#", ".1.weight"),
                         ("#BNB#", ".1.bias"), ("#BNM#", ".1.running_mean"),
                         ("#BNV#", ".1.running_var")]:
            kk = kk.replace(tag, rep)
        renamed[kk] = v
    return renamed


def test_full_roundtrip():
    """torch sd -> convert_dla34 -> invert_to_torch must reproduce the
    original state_dict EXACTLY (the inverse recovers the converter's
    element permutation from an index probe, so every transpose/flip
    must round-trip bit-for-bit)."""
    from centertrack_tpu.tools.convert_torch_weights import invert_to_torch

    sd = _fabricated_reference_sd()
    params, stats, unused = convert_dla34(sd)
    assert not unused, unused[:5]
    back = invert_to_torch(params, stats, sd, convert_dla34)
    assert set(back) == set(sd)
    for k in sd:
        assert back[k].shape == sd[k].shape, k
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def _fabricated_reference_sd():
    """A torch state_dict with reference names and reference shapes
    (random values), for the dla_34 tracking config."""
    net = CenterTrackNet(
        arch="dla", num_layers=34,
        heads=(("hm", 1), ("reg", 2), ("wh", 2), ("tracking", 2)),
        head_convs=(("hm", (256,)), ("reg", (256,)), ("wh", (256,)),
                    ("tracking", (256,))),
        dla_node="dcn", with_pre_img=True, with_pre_hm=True)
    x = jnp.zeros((1, 32, 32, 3))
    hm = jnp.zeros((1, 32, 32, 1))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, hm)
    tmpl_p = _flatten(variables["params"])
    tmpl_s = _flatten(variables["batch_stats"])

    # fabricate torch tensors with reference naming via the inverse map
    sd = {}
    rng = np.random.RandomState(0)

    def inv_conv(shape):
        kh, kw, i, o = shape
        return rng.randn(o, i, kh, kw).astype(np.float32)

    for path, w in tmpl_p.items():
        name = _to_torch_name(path, tmpl_p)
        if name is None:
            continue
        if name.endswith((".weight",)) and w.ndim == 4:
            sd[name] = inv_conv(w.shape)
        else:
            sd[name] = rng.randn(*w.shape).astype(np.float32)
    for path, w in tmpl_s.items():
        name = _to_torch_stat_name(path)
        sd[name] = rng.rand(*w.shape).astype(np.float32)
    return sd


def test_converted_tree_structure():
    """Build a fake torch state dict directly with reference names and
    the reference shapes, convert, and verify every leaf of our model's
    param tree is covered with the right shape."""
    net = CenterTrackNet(
        arch="dla", num_layers=34,
        heads=(("hm", 1), ("reg", 2), ("wh", 2), ("tracking", 2)),
        head_convs=(("hm", (256,)), ("reg", (256,)), ("wh", (256,)),
                    ("tracking", (256,))),
        dla_node="dcn", with_pre_img=True, with_pre_hm=True)
    x = jnp.zeros((1, 32, 32, 3))
    hm = jnp.zeros((1, 32, 32, 1))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, hm)
    tmpl_p = _flatten(variables["params"])
    tmpl_s = _flatten(variables["batch_stats"])

    sd = _fabricated_reference_sd()
    params, stats, unused = convert_dla34(sd)
    got_p = _flatten(params)
    got_s = _flatten(stats)
    missing = set(tmpl_p) - set(got_p)
    extra = set(got_p) - set(tmpl_p)
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]
    for k in tmpl_p:
        assert got_p[k].shape == tmpl_p[k].shape, k
    missing_s = set(tmpl_s) - set(got_s)
    assert not missing_s, sorted(missing_s)[:10]
    assert not unused, unused[:10]


def _to_torch_name(path, flat_p):
    """flax param path -> reference state_dict name (for fabrication)."""
    if path.startswith("heads/"):
        parts = path.split("/")
        head, layer, leaf = parts[1], parts[2], parts[3]
        n_convs = len({pp.split("/")[2] for pp in flat_p
                       if pp.startswith(f"heads/{head}/")
                       and pp.split("/")[2] != "out"})
        idx = (int(layer.split("_")[1]) * 2 if layer != "out"
               else n_convs * 2)
        return f"{head}.{idx}." + ("weight" if leaf == "kernel" else "bias")
    p = path.replace("backbone/base/", "base.").replace("backbone/", "")
    # conv-levels: flax level0_0/conv -> torch Sequential base.level0.0
    import re as _re
    m = _re.match(r"base\.level([01])_(\d)/(conv/kernel|bn/(\w+))", p)
    if m:
        lvl, i = m.group(1), int(m.group(2))
        if m.group(3) == "conv/kernel":
            return f"base.level{lvl}.{3 * i}.weight"
        leaf = m.group(4)
        leaf = {"scale": "weight"}.get(leaf, leaf)
        return f"base.level{lvl}.{3 * i + 1}.{leaf}"
    if "conv_offset_mask" in p:
        return p.replace("/conv_offset_mask/kernel",
                         ".conv_offset_mask.weight").replace(
            "/conv_offset_mask/bias", ".conv_offset_mask.bias").replace(
            "/conv", ".conv").replace("/", ".")
    if "/up_" in p and p.endswith("/kernel"):
        return p.replace("/kernel", ".weight").replace("/", ".")
    if "actf_bn" in p:
        return p.replace("/actf_bn/scale", ".actf.0.weight").replace(
            "/actf_bn/bias", ".actf.0.bias").replace("/", ".")
    if p.endswith("/conv/weight") or "/conv/weight" in p:
        pass
    name = p.replace("/conv/kernel", ".0.weight")
    name = name.replace("/bn/scale", ".1.weight")
    name = name.replace("/bn/bias", ".1.bias")
    # DCN plain weight/bias inside DeformNode conv
    name = name.replace("/weight", ".weight").replace("/bias", ".bias")
    name = name.replace("/", ".")
    # reference nests blocks without the ConvBNAct wrapper: conv1 is a
    # module with .weight? No: BasicBlock.conv1 IS nn.Conv2d and bn1 is
    # separate. Our conv1 = ConvBNAct(conv+bn). Map conv1.0->conv1,
    # conv1.1->bn1 etc.
    import re
    name = re.sub(r"conv(\d)\.0\.weight", r"conv\1.weight", name)
    name = re.sub(r"conv(\d)\.1\.(\w+)", r"bn\1.\2", name)
    name = name.replace("root.conv.0.weight", "root.conv.weight")
    name = name.replace("root.conv.1.", "root.bn.")
    return name


def _to_torch_stat_name(path):
    import re as _re
    m = _re.match(
        r"backbone/base/level([01])_(\d)/bn/(mean|var)", path)
    if m:
        lvl, i, leaf = m.group(1), int(m.group(2)), m.group(3)
        return f"base.level{lvl}.{3 * i + 1}.running_{leaf}"
    name = path.replace("backbone/base/", "base.").replace(
        "backbone/", "").replace("heads/", "")
    name = name.replace("/bn/mean", ".1.running_mean")
    name = name.replace("/bn/var", ".1.running_var")
    name = name.replace("/actf_bn/mean", ".actf.0.running_mean")
    name = name.replace("/actf_bn/var", ".actf.0.running_var")
    name = name.replace("/", ".")
    import re
    name = re.sub(r"conv(\d)\.1\.(\w+)", r"bn\1.\2", name)
    name = name.replace("root.conv.1.", "root.bn.")
    return name
