"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: partition
specs resolve, the sharded train step runs (DP x FSDP x TP), and batched
generation works with a data-sharded batch — the v5e-8 scale-out contracts
(SURVEY.md §2.5, BASELINE configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vaura_tpu.parallel.mesh import batch_sharding, make_mesh
from vaura_tpu.parallel.partitioning import param_shardings, spec_for
from vaura_tpu.train.state import TrainState, make_optimizer
from vaura_tpu.train.steps import make_train_step, split_params

from tests.test_system import DAC_TINY, ENC_TINY, SAMPLER_TINY, _batch


@pytest.fixture(scope="module")
def system():
    from vaura_tpu.models.vaura import VauraSystem

    sys_ = VauraSystem(
        sampler_config=SAMPLER_TINY,
        dac_config=DAC_TINY,
        encoder_config=ENC_TINY,
        freeze_feature_extractor=True,
    )
    params = sys_.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    return sys_, params


def test_spec_rules():
    assert spec_for("layers/attention/wqkv/kernel", 3) == P(None, "fsdp", "model")
    assert spec_for("layers/feed_forward/w2/kernel", 3) == P(None, "model", "fsdp")
    assert spec_for("lm_head/kernel", 2) == P("fsdp", "model")
    assert spec_for("dac/encoder/conv_in/conv/kernel", 3) == P()
    assert spec_for("layers/attention_norm/weight", 2) == P(None, None)


def test_mesh_shapes():
    mesh = make_mesh(data=2, fsdp=2, model=2)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}
    mesh = make_mesh(fsdp=4)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 4, "model": 1}


@pytest.mark.slow
def test_sharded_train_step(system):
    sys_, params = system
    mesh = make_mesh(data=2, fsdp=2, model=2)
    trainable, frozen = split_params(sys_, params)
    trainable = jax.tree.map(
        jax.device_put, trainable, param_shardings(mesh, trainable)
    )
    frozen = jax.tree.map(jax.device_put, frozen, param_shardings(mesh, frozen))
    state = TrainState.create(trainable, make_optimizer(1e-3))
    bs = batch_sharding(mesh)
    batch = {
        k: jax.device_put(v, bs) for k, v in _batch(B=4).items()
    }
    step = make_train_step(sys_, donate=False)
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params keep their shardings through the update
    wqkv = state.params["sampler"]["layers"]["attention"]["wqkv"]["kernel"]
    assert wqkv.sharding.spec == P(None, "fsdp", "model")


@pytest.mark.slow
def test_sharded_generation(system):
    """Batched generation with the batch sharded over the data axes
    (the 'VisualSound test-split on v5e-8' config shape)."""
    sys_, params = system
    mesh = make_mesh(data=4, fsdp=2, model=1)
    params_s = jax.tree.map(jax.device_put, params, param_shardings(mesh, params))
    B = 8
    frames = jax.device_put(_batch(B=B)["frames"], batch_sharding(mesh))
    out = sys_.generate(
        params_s,
        frames,
        jax.random.PRNGKey(1),
        max_new_tokens=10,
        top_k=4,
        cfg_scale=2.0,
        decode_to_audio=False,
    )
    codes = np.asarray(out["codes"])
    assert codes.shape == (B, 3, 10)
    assert (codes >= 0).all()
