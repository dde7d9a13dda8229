"""VGGish embedder: frontend spec, converter parity vs a torchvggish-layout
torch network, and the eval-action FAD plumbing (VERDICT r1 #8).

The oracle here is the PUBLISHED architecture (Hershey et al. 2017 /
torchvggish layout) — /root/reference contains no VGGish code (it
delegates FAD to external frameworks, reference README.md:93), so a
spec-built torch twin is the correctness bar for the weight converter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from vaura_tpu.ops.vggish import (  # noqa: E402
    convert_vggish_state_dict,
    log_mel_patches,
    vggish_embed,
)


def _torch_vggish():
    """torchvggish's exact module layout (features/embeddings naming)."""
    features = nn.Sequential(
        nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
    )
    embeddings = nn.Sequential(
        nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
        nn.Linear(4096, 4096), nn.ReLU(True),
        nn.Linear(4096, 128), nn.ReLU(True),
    )

    class VGGish(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.embeddings = embeddings

        def forward(self, x):  # x: [N, 1, 96, 64]
            x = self.features(x)
            # torchvggish: transpose to (N, h, w, c) before flattening
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    return VGGish()


def test_frontend_patch_spec():
    """0.96 s examples of 96 frames x 64 HTK-mel bands at 16 kHz; longer
    clips tile without overlap; resampling handles 44.1 kHz input."""
    sr = 16000
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(int(2.0 * sr)).astype(np.float32) * 0.1
    patches = log_mel_patches(wav, sr)
    assert patches.shape == (2, 96, 64)  # 2.0 s -> two 0.96 s examples
    assert np.isfinite(patches).all()
    # 44.1 kHz input resamples to the same example count
    wav44 = rng.standard_normal(int(2.0 * 44100)).astype(np.float32) * 0.1
    assert log_mel_patches(wav44, 44100).shape == (2, 96, 64)
    # sub-example clips produce an empty set, not a crash
    assert log_mel_patches(wav[:1000], sr).shape == (0, 96, 64)


@pytest.mark.slow
def test_converter_parity_vs_torch_network():
    """Converted torchvggish weights reproduce the torch network's 128-d
    embeddings on random log-mel patches."""
    torch.manual_seed(0)
    net = _torch_vggish().eval()
    params = convert_vggish_state_dict(net.state_dict())

    rng = np.random.default_rng(1)
    patches = rng.standard_normal((3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(patches)[:, None]).numpy()
    ours = np.asarray(vggish_embed(params, patches))
    np.testing.assert_allclose(ref, ours, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_eval_action_reports_fad_vggish(tmp_path):
    """The eval surface reports fad_vggish on a directory pair with a
    named pretrained-style embedder (VERDICT r1 'Done' criterion)."""
    from scripts.eval_metrics import evaluate_dirs
    from vaura_tpu.ops.audio import write_wav

    torch.manual_seed(2)
    ckpt = tmp_path / "vggish.pth"
    torch.save(_torch_vggish().state_dict(), ckpt)

    gen, ref = tmp_path / "gen", tmp_path / "ref"
    gen.mkdir(), ref.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        for d in (gen, ref):
            wav = (rng.standard_normal(int(1.0 * 16000)) * 0.1).astype(
                np.float32
            )
            write_wav(d / f"c{i}.wav", wav[None], 16000)
    report = evaluate_dirs(
        gen, ref, fad=True, embedder="vggish", embedder_ckpt=str(ckpt)
    )
    assert report["n"] == 3
    assert np.isfinite(report["mean"]["fad_vggish"])
    assert report["mean"]["fad_vggish"] >= 0
