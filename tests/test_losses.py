import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from centertrack_tpu.ops import losses


def _gather_torch(feat_nhwc, ind):
    # feat: B,H,W,F numpy; ind: B,M
    b, h, w, f = feat_nhwc.shape
    feat = torch.from_numpy(feat_nhwc.reshape(b, h * w, f))
    ind = torch.from_numpy(ind.astype(np.int64))
    ind = ind.unsqueeze(2).expand(b, ind.size(1), f)
    return feat.gather(1, ind)


def test_fast_focal_matches_torch():
    rng = np.random.RandomState(0)
    b, h, w, c, m = 2, 8, 8, 3, 6
    out = rng.rand(b, h, w, c).astype(np.float32) * 0.9 + 0.05
    target = np.zeros((b, h, w, c), np.float32)
    ind = rng.randint(0, h * w, (b, m))
    cat = rng.randint(0, c, (b, m))
    mask = (rng.rand(b, m) > 0.3).astype(np.float32)
    for bi in range(b):
        for mi in range(m):
            if mask[bi, mi]:
                y, x = ind[bi, mi] // w, ind[bi, mi] % w
                target[bi, y, x, cat[bi, mi]] = 1.0

    ours = float(losses.fast_focal_loss(
        jnp.asarray(out), jnp.asarray(target), jnp.asarray(ind),
        jnp.asarray(mask), jnp.asarray(cat)))

    # torch reference (losses.py:67-97)
    t_out = torch.from_numpy(out.transpose(0, 3, 1, 2))
    t_tgt = torch.from_numpy(target.transpose(0, 3, 1, 2))
    neg = (torch.log(1 - t_out) * torch.pow(t_out, 2) *
           torch.pow(1 - t_tgt, 4)).sum()
    pos_pred_pix = _gather_torch(out, ind)  # B,M,C
    pos_pred = pos_pred_pix.gather(
        2, torch.from_numpy(cat.astype(np.int64)).unsqueeze(2))
    num_pos = mask.sum()
    pos = (torch.log(pos_pred) * torch.pow(1 - pos_pred, 2) *
           torch.from_numpy(mask).unsqueeze(2)).sum()
    ref = -(pos + neg) / num_pos
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_fast_focal_no_positives():
    out = np.full((1, 4, 4, 1), 0.3, np.float32)
    target = np.zeros((1, 4, 4, 1), np.float32)
    ind = np.zeros((1, 2), np.int64)
    mask = np.zeros((1, 2), np.float32)
    cat = np.zeros((1, 2), np.int64)
    ours = float(losses.fast_focal_loss(
        jnp.asarray(out), jnp.asarray(target), jnp.asarray(ind),
        jnp.asarray(mask), jnp.asarray(cat)))
    ref = -(np.log(1 - 0.3) * 0.3 ** 2) * 16
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_reg_weighted_l1_matches_torch():
    rng = np.random.RandomState(1)
    b, h, w, f, m = 2, 8, 8, 2, 5
    out = rng.randn(b, h, w, f).astype(np.float32)
    ind = rng.randint(0, h * w, (b, m))
    target = rng.randn(b, m, f).astype(np.float32)
    mask = (rng.rand(b, m, f) > 0.4).astype(np.float32)

    ours = float(losses.reg_weighted_l1_loss(
        jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
        jnp.asarray(target)))
    pred = _gather_torch(out, ind)
    ref = F.l1_loss(pred * torch.from_numpy(mask),
                    torch.from_numpy(target * mask), reduction="sum")
    ref = float(ref) / (mask.sum() + 1e-4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bin_rot_loss_matches_torch():
    rng = np.random.RandomState(2)
    b, h, w, m = 1, 8, 8, 4
    out = rng.randn(b, h, w, 8).astype(np.float32)
    ind = rng.randint(0, h * w, (b, m))
    rotbin = rng.randint(0, 2, (b, m, 2))
    rotres = rng.randn(b, m, 2).astype(np.float32)
    mask = (rng.rand(b, m) > 0.3).astype(np.float32)

    ours = float(losses.bin_rot_loss(
        jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
        jnp.asarray(rotbin), jnp.asarray(rotres)))

    # torch reference (losses.py:161-192)
    pred = _gather_torch(out, ind).view(-1, 8)
    tb = torch.from_numpy(rotbin.reshape(-1, 2))
    tr = torch.from_numpy(rotres.reshape(-1, 2))
    tm = torch.from_numpy(mask.reshape(-1, 1))

    def bin_loss(output, target, mask_):
        mask_ = mask_.expand_as(output)
        output = output * mask_.float()
        return F.cross_entropy(output, target, reduction="mean")

    loss_bin1 = bin_loss(pred[:, 0:2], tb[:, 0], tm)
    loss_bin2 = bin_loss(pred[:, 4:6], tb[:, 1], tm)
    loss_res = torch.zeros_like(loss_bin1)
    if tb[:, 0].nonzero().shape[0] > 0:
        idx1 = tb[:, 0].nonzero()[:, 0]
        v_o = pred[idx1]
        v_t = tr[idx1]
        loss_res = loss_res + F.smooth_l1_loss(
            v_o[:, 2], torch.sin(v_t[:, 0])) + F.smooth_l1_loss(
            v_o[:, 3], torch.cos(v_t[:, 0]))
    if tb[:, 1].nonzero().shape[0] > 0:
        idx2 = tb[:, 1].nonzero()[:, 0]
        v_o = pred[idx2]
        v_t = tr[idx2]
        loss_res = loss_res + F.smooth_l1_loss(
            v_o[:, 6], torch.sin(v_t[:, 1])) + F.smooth_l1_loss(
            v_o[:, 7], torch.cos(v_t[:, 1]))
    ref = float(loss_bin1 + loss_bin2 + loss_res)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_weighted_bce_matches_torch():
    rng = np.random.RandomState(3)
    b, h, w, f, m = 1, 8, 8, 8, 4
    out = rng.randn(b, h, w, f).astype(np.float32)
    ind = rng.randint(0, h * w, (b, m))
    target = (rng.rand(b, m, f) > 0.5).astype(np.float32)
    mask = (rng.rand(b, m, f) > 0.4).astype(np.float32)
    ours = float(losses.weighted_bce_loss(
        jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
        jnp.asarray(target)))
    pred = _gather_torch(out, ind)
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")(
        pred, torch.from_numpy(target))
    ref = float((torch.from_numpy(mask) * bce).sum()) / (mask.sum() + 1e-4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
