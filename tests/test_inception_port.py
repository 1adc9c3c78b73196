"""InceptionV3 port oracle (VERDICT r3 #7): a random-weight torch
re-implementation of the torchvision Inception-v3 trunk (BasicConv2d =
conv+BN eps 1e-3; InceptionA/B/C/D/E blocks; torchvision is NOT in this
image, so the oracle is built here from torch primitives following
torchvision/models/inception.py) is compared against
sjd_tpu.eval.inception's BN-folded JAX port — features must match to fp
tolerance, so on checkpoint day --inception-ckpt produces calibrated FID
(reference scoring: evaluation_metrics.py:112-271 via pytorch_fid)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sjd_tpu.eval.inception import pool3_features, port_inception_v3


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class Inception3Trunk(nn.Module):
    """torchvision inception_v3 up to the pool3 features (fc dropped)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)

    def forward(self, x):  # x in [0, 1]
        x = x * 2 - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                    self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                    self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                    self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        return x.mean(dim=(2, 3))  # [N, 2048]


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net


def test_inception_port_matches_torch_oracle():
    net = _randomize(Inception3Trunk()).eval()
    rs = np.random.RandomState(0)
    imgs = rs.rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

    params = port_inception_v3(net.state_dict())
    # fid_pools=False == the stock torchvision graph the oracle implements
    got = np.asarray(
        pool3_features(params, jnp.asarray(imgs), fid_pools=False)
    )
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_fid_pools_change_features():
    """fid_pools=True must actually flip the pytorch_fid pool semantics
    (count_include_pad=False + Mixed_7c max pool) — features differ from
    the stock graph on the same weights."""
    net = _randomize(Inception3Trunk(), seed=1).eval()
    params = port_inception_v3(net.state_dict())
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.rand(1, 128, 128, 3).astype(np.float32))
    a = np.asarray(pool3_features(params, imgs, fid_pools=False))
    b = np.asarray(pool3_features(params, imgs, fid_pools=True))
    assert not np.allclose(a, b)


def test_extractor_from_ckpt_file(tmp_path):
    """make_inception_extractor_from_ckpt: torch file -> port -> resize ->
    jitted features (the --inception-ckpt seam)."""
    from sjd_tpu.eval.inception import make_inception_extractor_from_ckpt

    net = _randomize(Inception3Trunk(), seed=2).eval()
    path = str(tmp_path / "inception.pt")
    torch.save(net.state_dict(), path)
    extract = make_inception_extractor_from_ckpt(path, batch=2)
    rs = np.random.RandomState(2)
    feats = extract(rs.rand(3, 64, 64, 3).astype(np.float32))
    assert feats.shape == (3, 2048) and np.isfinite(feats).all()


# ---------------------------------------------------------------------------
# Round-5 verdict #7: de-circularize the oracle.
#
# The numeric oracle above builds every primitive from torch.nn itself (conv,
# BN-eps-1e-3, pooling), so only the block WIRING is author-written. Two
# independent anchors pin that wiring to the real torchvision graph without
# torchvision in the image:
#   1. the stage-by-stage shape trace published as comments in
#      torchvision/models/inception.py's forward (any misread branch width,
#      stride, padding or concat breaks a channel/spatial count);
#   2. a golden-fixture seam: pool3 activations recorded ONCE from real
#      torchvision elsewhere (examples/record_inception_golden.py), keyed to
#      the weights file — the test runs whenever the fixture is supplied.
# ---------------------------------------------------------------------------

# torchvision/models/inception.py forward annotations ("N x C x H x W")
TORCHVISION_SHAPE_TRACE = {
    "Conv2d_1a_3x3": (32, 149, 149),
    "Conv2d_2a_3x3": (32, 147, 147),
    "Conv2d_2b_3x3": (64, 147, 147),
    "Conv2d_3b_1x1": (80, 73, 73),
    "Conv2d_4a_3x3": (192, 71, 71),
    "Mixed_5b": (256, 35, 35),
    "Mixed_5c": (288, 35, 35),
    "Mixed_5d": (288, 35, 35),
    "Mixed_6a": (768, 17, 17),
    "Mixed_6b": (768, 17, 17),
    "Mixed_6c": (768, 17, 17),
    "Mixed_6d": (768, 17, 17),
    "Mixed_6e": (768, 17, 17),
    "Mixed_7a": (1280, 8, 8),
    "Mixed_7b": (2048, 8, 8),
    "Mixed_7c": (2048, 8, 8),
}


def test_trunk_shape_trace_matches_torchvision_doc():
    net = Inception3Trunk().eval()
    seen = {}

    def hook(name):
        def fn(_m, _i, out):
            seen[name] = tuple(out.shape[1:])
        return fn

    for name in TORCHVISION_SHAPE_TRACE:
        getattr(net, name).register_forward_hook(hook(name))
    with torch.no_grad():
        net(torch.zeros(1, 3, 299, 299))
    assert seen == TORCHVISION_SHAPE_TRACE


def test_pool3_against_recorded_torchvision_golden():
    """Non-circular numeric anchor: INCEPTION_GOLDEN points at the npz
    written by examples/record_inception_golden.py on a machine WITH
    torchvision (pool3 for a seeded input + the weights file it used via
    INCEPTION_CKPT). Skipped when no fixture has been recorded — the
    in-repo oracle then covers numerics and the shape trace covers wiring."""
    import hashlib
    import os

    golden_path = os.environ.get("INCEPTION_GOLDEN", "")
    ckpt_path = os.environ.get("INCEPTION_CKPT", "")
    if not (golden_path and os.path.exists(golden_path) and ckpt_path
            and os.path.exists(ckpt_path)):
        pytest.skip("no recorded torchvision golden fixture "
                    "(set INCEPTION_GOLDEN + INCEPTION_CKPT; see "
                    "examples/record_inception_golden.py)")
    golden = np.load(golden_path)
    with open(ckpt_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    assert digest == str(golden["weights_sha256"]), (
        "fixture was recorded from different weights")
    from sjd_tpu.utils.port import load_torch_checkpoint

    params = port_inception_v3(load_torch_checkpoint(ckpt_path))
    imgs = np.random.default_rng(
        int(golden["input_seed"])).uniform(0, 1, (2, 299, 299, 3)).astype(
        np.float32)
    got = np.asarray(pool3_features(
        params, jnp.asarray(imgs), fid_pools=bool(golden["fid_pools"])))
    np.testing.assert_allclose(got, golden["pool3"], rtol=2e-3, atol=2e-3)
