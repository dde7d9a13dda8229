"""int8 validation at TRAINED logit margins (judge r2 item 2).

Random-weight logit margins are near zero, so any perturbation flips the
argmax and greedy decoding diverges immediately — that measurement says
nothing about serving-quality int8. A trained model's margins are what
matter. With released checkpoints unreachable offline, the proxy is the
flagship overfit recipe (24L x 1536d, fixed batch, loss 6.93 -> <0.5 in
~150 steps on the v5e): the overfit model has real (large) margins on its
training distribution, which is exactly the regime served tokens live in.

Measures, from the SAME trained weights:
  * teacher-forced argmax agreement, int8(w+cache) vs bf16, on the
    training batch (in-distribution margins)
  * greedy generation token agreement over full 221-token rollouts
  * greedy agreement at CFG 6.0 (the serving default; CFG subtracts two
    int8 forward passes, doubling the perturbation)
  * mean |logit delta| / std(logits)

Prints one JSON dict. Run on the TPU (exclusive chip):

    python scripts/int8_margin_check.py [--steps 150] [--batch 8]

Reference anchor: the reference serves fp16 weights with no quantized
path at all (``vaura_model.py:89-92`` runs the codec in half precision);
int8 here is a beyond-reference serving mode that must prove itself.
"""

from __future__ import annotations

if __package__ in (None, ""):
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--tokens", type=int, default=221)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--gen-batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="2L x 192d smoke config (CPU logic check only — "
                    "margins are NOT representative at this scale)")
    ap.add_argument("--mid", action="store_true",
                    help="6L x 512d config: CPU-runnable overfit whose "
                    "trained margins are a usable proxy when the TPU is "
                    "unavailable (flagship on v5e remains the headline)")
    ap.add_argument("--cache-bits", type=int, choices=[8, 4], default=8,
                    help="quantized KV-cache width for the comparison arm "
                    "(4 = nibble-packed int4; affects rollouts, not the "
                    "teacher-forced full forward)")
    ap.add_argument("--int8-dots", action="store_true",
                    help="int8 x int8 attention dots in the quantized arm")
    ap.add_argument("--cache-only", action="store_true",
                    help="quantized arm = bf16 weights + int8 KV cache "
                    "(serve.py quantize=cache; measured FASTER than full "
                    "int8 at B=128 — decode is cache-bandwidth-bound). "
                    "Teacher-forced rows compare identical graphs (the "
                    "cache only exists in the decode loop); the rollout "
                    "rows are the signal")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", str(args.platform))
    import jax.numpy as jnp

    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem
    from vaura_tpu.train.state import TrainState, make_optimizer
    from vaura_tpu.utils import cast_floats

    B = args.batch
    sampler_cfg = SamplerConfig(remat=True)  # flagship 24L x 1536d
    if args.tiny:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, num_layers=2, d_model=192, nhead=4,
            block_size_audio=64,
        )
        args.tokens = min(args.tokens, 48)
    elif args.mid:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, num_layers=6, d_model=512, nhead=8,
        )
    # codes are synthetic so the codec is never run, but the system wants
    # its config for geometry
    from vaura_tpu.models.dac.model import config_for_sample_rate

    system = VauraSystem(
        sampler_config=sampler_cfg,
        dac_config=config_for_sample_rate(44100),
        encoder_config=None,
        use_visual_conditioning=True,
    )

    rng = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 9, 16), jnp.int32)
    cond0 = jnp.zeros((1, 8, 768))
    sam = jax.jit(
        lambda r: system.sampler.init(
            {"params": r, "dropout": r, "cfg_dropout": r}, tokens0, cond0,
            False,
        )["params"]
    )(rng)
    state = TrainState.create({"sampler": sam}, make_optimizer(args.lr))

    rngb = np.random.default_rng(0)
    codes = jnp.asarray(rngb.integers(0, 1024, size=(B, 9, args.tokens)))
    vis = jnp.asarray(rngb.standard_normal((B, 32, 768)).astype(np.float32))

    def train_step(state, rng):
        def loss_fn(trainable):
            loss, _ = system.train_forward(
                trainable, None, None, rng, train=True, vis_feats=vis,
                codes=codes,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    t0 = time.time()
    loss0 = None
    for i in range(args.steps):
        state, loss = step(state, jax.random.PRNGKey(10 + i))
        if i == 0:
            loss0 = float(np.asarray(loss))
    loss_final = float(np.asarray(loss))
    print(f"# overfit: loss {loss0:.3f} -> {loss_final:.3f} "
          f"({args.steps} steps, {time.time()-t0:.0f}s)", flush=True)

    trained = jax.device_get(state.params["sampler"])
    del state

    # ---- teacher-forced logits: bf16 vs int8 ----------------------- #
    def build(quantize: bool):
        cache_only = quantize and args.cache_only
        cfg = dataclasses.replace(
            sampler_cfg, remat=False, dropout=0.0,
            quantize_weights=quantize and not cache_only,
            quantize_cache=quantize,
            cache_bits=args.cache_bits if quantize else 8,
            int8_dots=args.int8_dots if quantize else False,
        )
        sys_ = VauraSystem(
            sampler_config=cfg,
            dac_config=config_for_sample_rate(44100),
            encoder_config=None,
            use_visual_conditioning=True,
        )
        if quantize and not cache_only:
            from vaura_tpu.ops.quantization import quantize_sampler_params

            p = cast_floats(
                quantize_sampler_params(trained), jnp.bfloat16
            )
        else:
            p = cast_floats(trained, jnp.bfloat16)
        return sys_, {"sampler": p}

    sys_f, p_f = build(False)
    sys_q, p_q = build(True)

    def tf_logits(sys_, params):
        def fn(params):
            _, aux = sys_.train_forward(
                params, None, None, jax.random.PRNGKey(0), train=False,
                vis_feats=vis, codes=codes,
            )
            return aux["logits"], aux["mask"]

        return jax.jit(fn)(params)

    lf, mask = tf_logits(sys_f, p_f)
    lq, _ = tf_logits(sys_q, p_q)
    lf, lq = np.asarray(lf, np.float32), np.asarray(lq, np.float32)
    mask = np.asarray(mask, bool)
    am_f, am_q = lf.argmax(-1)[mask], lq.argmax(-1)[mask]
    tf_agree = float((am_f == am_q).mean())
    delta = float(np.abs(lq - lf)[mask].mean() / (lf[mask].std() + 1e-9))

    # ---- greedy rollouts ------------------------------------------- #
    from vaura_tpu.utils import cached_jit

    def rollout(sys_, params, cfg_scale):
        # jit the full pipeline (CLAUDE.md rule: eager generate dispatches
        # the surrounding cond-embed/prefill ops one-by-one over the tunnel)
        fn = cached_jit(
            sys_, "_rollout_jit", (args.gen_batch, args.tokens, cfg_scale),
            lambda p, v, r, _cs=cfg_scale: sys_.generate(
                p, None, r, vis_feats=v,
                max_new_tokens=args.tokens, tokens_per_frame=7,
                use_sampling=False, cfg_scale=_cs,
                decode_to_audio=False,
            )["codes"],
        )
        return np.asarray(
            fn(params, vis[: args.gen_batch], jax.random.PRNGKey(1))
        )

    gen_agree, first_div = {}, {}
    for cfg_scale in (1.0, 6.0):
        cf = rollout(sys_f, p_f, cfg_scale)
        cq = rollout(sys_q, p_q, cfg_scale)
        gen_agree[f"cfg{cfg_scale:g}"] = float((cf == cq).mean())
        # per-sample first step where ANY codebook disagrees (greedy
        # rollouts diverge permanently after one flip — the position of
        # the first flip is the honest robustness number)
        mism = (cf != cq).any(axis=1)  # [B, T]
        T = mism.shape[1]
        firsts = np.where(mism.any(axis=1), mism.argmax(axis=1), T)
        first_div[f"cfg{cfg_scale:g}"] = float(firsts.mean())

    print(json.dumps({
        "overfit_loss": round(loss_final, 4),
        "teacher_forced_argmax_agreement": round(tf_agree, 4),
        "greedy_token_agreement_cfg1": round(gen_agree["cfg1"], 4),
        "greedy_token_agreement_cfg6": round(gen_agree["cfg6"], 4),
        "greedy_mean_first_divergence_step_cfg1": first_div["cfg1"],
        "greedy_mean_first_divergence_step_cfg6": first_div["cfg6"],
        "mean_abs_logit_delta_over_std": round(delta, 5),
        "steps": args.steps, "batch": B, "tokens": args.tokens,
        "cache_bits": args.cache_bits, "int8_dots": args.int8_dots,
    }))


if __name__ == "__main__":
    main()
