"""Golden tests for the fused decode against torch reference semantics.

The torch mini-implementations below mirror reference
src/lib/model/utils.py and src/lib/model/decode.py exactly.
"""

import numpy as np
import torch
import jax.numpy as jnp

from centertrack_tpu.ops import decode


def torch_nms(heat, kernel=3):
    pad = (kernel - 1) // 2
    hmax = torch.nn.functional.max_pool2d(
        heat, (kernel, kernel), stride=1, padding=pad)
    keep = (hmax == heat).float()
    return heat * keep


def torch_gather_feat(feat, ind):
    dim = feat.size(2)
    ind = ind.unsqueeze(2).expand(ind.size(0), ind.size(1), dim)
    return feat.gather(1, ind)


def torch_topk(scores, K):
    batch, cat, height, width = scores.size()
    topk_scores, topk_inds = torch.topk(scores.reshape(batch, cat, -1), K)
    topk_inds = topk_inds % (height * width)
    topk_ys = (topk_inds // width).int().float()
    topk_xs = (topk_inds % width).int().float()
    topk_score, topk_ind = torch.topk(topk_scores.view(batch, -1), K)
    topk_clses = (topk_ind // K).int()
    topk_inds = torch_gather_feat(
        topk_inds.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_ys = torch_gather_feat(
        topk_ys.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_xs = torch_gather_feat(
        topk_xs.view(batch, -1, 1), topk_ind).view(batch, K)
    return topk_score, topk_inds, topk_clses, topk_ys, topk_xs


def test_nms_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 17, 24, 5).astype(np.float32)  # B,H,W,C
    ours = np.asarray(decode.nms_heat(jnp.asarray(x)))
    ref = torch_nms(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_topk_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 16, 20, 3).astype(np.float32)
    s, i, c, y, xx = decode.topk(jnp.asarray(x), 10)
    ts, ti, tc, ty, tx = torch_topk(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 10)
    np.testing.assert_allclose(np.asarray(s), ts.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ti.numpy())
    np.testing.assert_array_equal(np.asarray(c), tc.numpy())
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xx), tx.numpy(), atol=1e-6)


def test_generic_decode_boxes_tracking():
    rng = np.random.RandomState(2)
    b, h, w, c, k = 1, 16, 16, 2, 20
    out = {
        "hm": jnp.asarray(rng.rand(b, h, w, c).astype(np.float32)),
        "reg": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        "wh": jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32) * 5),
        "tracking": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
    }
    dets = decode.generic_decode(out, k=k, num_classes=c)

    # reference semantics computed with torch
    heat = torch_nms(torch.from_numpy(
        np.asarray(out["hm"]).transpose(0, 3, 1, 2)))
    scores, inds, clses, ys0, xs0 = torch_topk(heat, k)

    def t_gather(key):
        fm = torch.from_numpy(np.asarray(out[key]).transpose(0, 3, 1, 2))
        fm = fm.permute(0, 2, 3, 1).contiguous().view(b, -1, fm.size(1))
        return torch_gather_feat(fm, inds)

    reg = t_gather("reg")
    xs = xs0.view(b, k, 1) + reg[:, :, 0:1]
    ys = ys0.view(b, k, 1) + reg[:, :, 1:2]
    wh = t_gather("wh").clamp(min=0)
    ref_bboxes = torch.cat([
        xs - wh[..., 0:1] / 2, ys - wh[..., 1:2] / 2,
        xs + wh[..., 0:1] / 2, ys + wh[..., 1:2] / 2], dim=2)

    np.testing.assert_allclose(
        np.asarray(dets["scores"]), scores.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dets["bboxes"]), ref_bboxes.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dets["tracking"]), t_gather("tracking").numpy(),
        atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(dets["clses"]), clses.numpy().astype(np.float32))


def test_sigmoid_output_depth():
    x = jnp.asarray(np.zeros((1, 4, 4, 1), np.float32))
    out = decode.sigmoid_output({"dep": x, "hm": x})
    np.testing.assert_allclose(
        np.asarray(out["dep"]), 1.0 / (0.5 + 1e-6) - 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["hm"]), 0.5, rtol=1e-6)
