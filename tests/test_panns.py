"""PANNs CNN14 embedder: converter parity vs a published-spec torch twin,
frontend sanity, and kld_panns/fad_panns through the eval surface.

Like VGGish, the oracle is the PUBLISHED architecture (Kong et al. 2020 /
the official audioset_tagging_cnn layout) — the reference repo delegates
KLD/FAD to external frameworks and contains no PANNs code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from vaura_tpu.ops.panns import (  # noqa: E402
    cnn14_forward,
    convert_cnn14_state_dict,
    log_mel_spectrogram,
)


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        return torch.nn.functional.avg_pool2d(x, 2)


class _Cnn14(nn.Module):
    """The official Cnn14 layout (state-dict names match the released
    checkpoint); spectrogram extraction handled outside like ours."""

    def __init__(self):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(64)
        chans = (1, 64, 128, 256, 512, 1024, 2048)
        for i in range(6):
            setattr(self, f"conv_block{i + 1}", _ConvBlock(chans[i], chans[i + 1]))
        self.fc1 = nn.Linear(2048, 2048)
        self.fc_audioset = nn.Linear(2048, 527)

    def forward(self, logmel):  # [N, T, 64]
        x = logmel[:, None]  # [N, 1, T, 64]
        x = x.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        for i in range(6):
            x = getattr(self, f"conv_block{i + 1}")(x)
        x = torch.mean(x, dim=3)  # mel axis
        x = torch.max(x, dim=2)[0] + torch.mean(x, dim=2)  # time pool
        emb = torch.relu(self.fc1(x))
        return emb, torch.sigmoid(self.fc_audioset(emb))


def _randomized_cnn14(seed=0):
    torch.manual_seed(seed)
    net = _Cnn14().eval()
    # non-trivial BN statistics (fresh BN has mean 0 / var 1)
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    return net


def test_frontend_logmel_shape_and_scale():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)  # 1 s @ 32 kHz
    lm = log_mel_spectrogram(wav, 32000)
    assert lm.shape == (101, 64)  # centered frames: 1 + 32000 // 320
    assert np.isfinite(lm).all() and lm.max() <= 60  # dB-scale values
    lm44 = log_mel_spectrogram(
        (rng.standard_normal(44100) * 0.1).astype(np.float32), 44100
    )
    assert lm44.shape == (101, 64)  # resampled to the same duration


@pytest.mark.slow
def test_converter_parity_vs_torch_network():
    net = _randomized_cnn14()
    params = convert_cnn14_state_dict(net.state_dict())
    rng = np.random.default_rng(1)
    logmel = (rng.standard_normal((2, 96, 64)) * 10 - 20).astype(np.float32)
    with torch.no_grad():
        ref_emb, ref_probs = net(torch.from_numpy(logmel))
    emb, probs = cnn14_forward(params, logmel)
    np.testing.assert_allclose(
        ref_emb.numpy(), np.asarray(emb), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        ref_probs.numpy(), np.asarray(probs), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_eval_reports_fad_and_kld_panns(tmp_path):
    from scripts.eval_metrics import evaluate_dirs
    from vaura_tpu.ops.audio import write_wav

    net = _randomized_cnn14(seed=2)
    ckpt = tmp_path / "cnn14.pth"
    torch.save({"model": net.state_dict()}, ckpt)

    gen, ref = tmp_path / "gen", tmp_path / "ref"
    gen.mkdir(), ref.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        for d in (gen, ref):
            wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
            write_wav(d / f"c{i}.wav", wav[None], 32000)
    report = evaluate_dirs(
        gen, ref, fad=True, embedder="panns", embedder_ckpt=str(ckpt)
    )
    assert report["n"] == 3
    assert np.isfinite(report["mean"]["fad_panns"])
    assert np.isfinite(report["mean"]["kld_panns"])
    assert report["mean"]["kld_panns"] >= 0
