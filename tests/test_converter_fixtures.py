"""Published-checkpoint schema fixtures drive the converters end-to-end.

Day-one real-weight insurance (VERDICT r3 item 9): the manifests in
``tests/fixtures/*.keys.json`` snapshot the exact key names + shapes of
the descript-DAC 44 kHz 8 kbps release and the AVCLIP/Synchformer stage-I
VGGSound checkpoint (see ``tests/make_converter_fixtures.py`` for
provenance). These tests synthesize tensors to those schemas and assert
the converters produce param trees that exactly match the target flax
modules at published scale — so the first real download converts without
a debugging round."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def _synth_sd(manifest):
    rng = np.random.default_rng(0)
    return {
        k: torch.from_numpy(
            (rng.standard_normal(shape) * 0.02).astype(np.float32)
        )
        for k, shape in manifest["keys"].items()
    }


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


@pytest.mark.slow
def test_dac_published_schema_converts():
    from vaura_tpu.models.convert import convert_dac_state_dict
    from vaura_tpu.models.dac.model import Dac, config_for_sample_rate

    manifest = json.loads(
        (FIXTURES / "dac_44khz_8kbps.keys.json").read_text()
    )
    cfg = config_for_sample_rate(44100)
    assert manifest["config"]["n_codebooks"] == cfg.n_codebooks
    sd = _synth_sd(manifest)
    # the release wraps the weights: {"metadata": ..., "state_dict": ...}
    params = convert_dac_state_dict(sd)

    model = Dac(cfg)
    want = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 1, 2048)))["params"],
        jax.random.PRNGKey(0),
    )
    got_s, want_s = _tree_shapes(params), _tree_shapes(want)
    assert got_s == want_s, (
        sorted(set(want_s) - set(got_s))[:5],
        sorted(set(got_s) - set(want_s))[:5],
        [k for k in got_s if k in want_s and got_s[k] != want_s[k]][:5],
    )


@pytest.mark.slow
def test_avclip_stage1_schema_converts():
    from vaura_tpu.models.convert import (
        convert_motionformer_state_dict,
        strip_avclip_prefix,
    )
    from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig

    manifest = json.loads(
        (FIXTURES / "avclip_stage1_vggsound.keys.json").read_text()
    )
    sd = _synth_sd(manifest)
    stripped = strip_avclip_prefix(sd)
    # the audio tower must have been filtered out
    assert not any(k.startswith(("a_encoder.", "module.")) for k in stripped)
    params = convert_motionformer_state_dict(stripped)

    # stage-I flagship geometry: ViT-B/16 divided, separate pos-emb,
    # spatial agg transformer layer, Identity temporal agg
    cfg = MotionFormerConfig(
        agg_time_module="Identity", add_global_repr=False,
        dtype=jnp.float32,
    )
    model = MotionFormer(cfg)
    want = jax.eval_shape(
        lambda r: model.init(
            r, jnp.zeros((1, 1, 3, 16, 224, 224)))["params"],
        jax.random.PRNGKey(0),
    )
    got_s, want_s = _tree_shapes(params), _tree_shapes(want)
    assert got_s == want_s, (
        sorted(set(want_s) - set(got_s))[:5],
        sorted(set(got_s) - set(want_s))[:5],
        [k for k in got_s if k in want_s and got_s[k] != want_s[k]][:5],
    )
