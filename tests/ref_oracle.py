"""Import the ACTUAL reference modules from /root/reference as test oracles.

The reference depends on pip packages that are not installed here
(``dac`` = descript-audio-codec, ``timm``, ``omegaconf``, ...).  Rather
than re-implementing torch replicas of the reference modules (which can
encode the same misreading as the code under test), this helper installs
*minimal import shims* for the few names the reference touches and then
imports the reference source itself, so parity tests assert against the
real ``llama.Transformer``, ``vit_helper`` blocks, and pattern providers.

The shims are deliberately tiny and only cover names used by the modules
we import:

* ``dac``           — ``dac.model.DAC`` (type annotation only) and
                      ``dac.nn.layers.WNConv1d`` (identical construction to
                      descript's: ``weight_norm(nn.Conv1d(...))``).
* ``timm``          — ``DropPath`` (reference ships its own equivalent in
                      ``utils/drop_path.py``), ``to_2tuple``,
                      ``trunc_normal_`` (re-exported from torch),
                      ImageNet mean/std constants, and the
                      ``register_model`` decorator (identity).

Nothing here alters the numerics of the reference code paths under test:
``WNConv1d`` shim uses the same torch ``weight_norm`` parameterization the
real package uses, and the timm names are either unused at runtime
(resnets, registry) or exact re-exports (``trunc_normal_``).
"""

from __future__ import annotations

import sys
import types
import warnings

REF_ROOT = "/root/reference"
AVCLIP_ROOT = REF_ROOT + "/models/modules/feature_extractors/avclip"

_installed = False


def _module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs() -> None:
    """Register import shims + reference paths. Idempotent."""
    global _installed
    if _installed:
        return
    warnings.filterwarnings(
        "ignore", message=".*weight_norm.*", category=FutureWarning
    )
    warnings.filterwarnings(
        "ignore", message=".*weight_norm.*", category=UserWarning
    )
    import torch
    import torch.nn as torch_nn
    from torch.nn.utils import weight_norm as _torch_weight_norm

    for p in (REF_ROOT, AVCLIP_ROOT):
        if p not in sys.path:
            sys.path.append(p)

    # --- dac (descript-audio-codec) ------------------------------------
    class DAC:  # used by the reference only as a type annotation
        pass

    def WNConv1d(*args, **kwargs):
        # descript's dac/nn/layers.py: weight_norm(nn.Conv1d(*a, **k))
        return _torch_weight_norm(torch_nn.Conv1d(*args, **kwargs))

    dac = _module("dac")
    dac.model = _module("dac.model", DAC=DAC)
    dac.nn = _module("dac.nn")
    dac.nn.layers = _module("dac.nn.layers", WNConv1d=WNConv1d)

    # --- timm (only names vit_helper/video_model_builder import) -------
    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    # reference ships its own DropPath (utils/drop_path.py); reuse it so
    # the shim carries zero behavior of its own
    import importlib

    drop_path_mod = importlib.import_module("utils.drop_path")

    def register_model(fn):
        return fn

    timm = _module("timm")
    timm.data = _module(
        "timm.data",
        IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
        IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225),
    )
    timm.models = _module("timm.models")
    timm.models.layers = _module(
        "timm.models.layers",
        DropPath=drop_path_mod.DropPath,
        to_2tuple=to_2tuple,
        trunc_normal_=torch_nn.init.trunc_normal_,
    )
    timm.models.resnet = _module(
        "timm.models.resnet", resnet26d=None, resnet50d=None
    )
    timm.models.registry = _module(
        "timm.models.registry", register_model=register_model
    )

    # --- omegaconf (import-time only: the avclip wrapper imports OmegaConf
    # at module level but we never construct the full MotionFormer class,
    # only its aggregation-layer classes which don't touch it) -----------
    class _OmegaConfUnavailable:
        def __getattr__(self, name):
            raise RuntimeError(
                "omegaconf stub: reference config loading is not exercised"
            )

    _module("omegaconf", OmegaConf=_OmegaConfUnavailable())
    _installed = True


def import_ref(name: str):
    """Import a reference module (e.g. ``models.modules.sampler.llama``)."""
    install_stubs()
    import importlib

    return importlib.import_module(name)


_vaura_shims_installed = False


def import_ref_vaura_model():
    """Import the reference's composite ``models.vaura_model`` module.

    Beyond :func:`install_stubs` this needs:
      * ``pytorch_lightning.LightningModule`` — a plain ``nn.Module``
        subclass with no-op ``save_hyperparameters``/``log`` (the parity
        tests never run a Trainer);
      * ``av`` — imported by ``utils/utils.py`` at module level, used only
        inside ``write_video`` which the tests don't call;
      * fake ``utils.train_utils`` / ``utils.data_utils`` modules exposing
        just the names ``vaura_model.py:18-23`` imports — the real ones
        pull the whole Lightning + datamodule dependency web (torchaudio,
        torchvision, pyloudnorm) that isn't installed here.  None of the
        faked names participate in the code paths under test
        (``disabled_train`` is a freeze helper; the attn-video and
        ``scale_tensor`` helpers are TB-logging only).
    """
    global _vaura_shims_installed
    install_stubs()
    if not _vaura_shims_installed:
        import torch.nn as torch_nn

        class LightningModule(torch_nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

        _module("pytorch_lightning", LightningModule=LightningModule)
        _module("av")

        def disabled_train(self, mode=True):
            return self

        def _logging_only(*a, **k):
            raise RuntimeError("TB-logging helper stub: not under test")

        _module(
            "utils.train_utils",
            disabled_train=disabled_train,
            generate_video_from_attn_weights=_logging_only,
            combine_attn_weights_to_tensor=_logging_only,
        )
        _module("utils.data_utils", scale_tensor=_logging_only)
        _vaura_shims_installed = True
    import importlib

    return importlib.import_module("models.vaura_model")


def bind_vaura_methods(dummy, *names):
    """Bind reference ``VAURAModel`` methods onto a duck-typed dummy object
    so composite-level code paths (generate, loss) run the REAL reference
    implementation against attributes we control."""
    import types as _types

    vm = import_ref_vaura_model()
    for name in names:
        fn = getattr(vm.VAURAModel, name)
        setattr(dummy, name, _types.MethodType(fn, dummy))
    return dummy


def make_fake_dac(num_codebooks: int, codebook_dim: int, vocab: int,
                  token_dim: int, seed: int = 0):
    """A minimal object satisfying what ``Transformer.initialize_embeddings``
    reads from a DAC model (reference ``llama.py:387-412``): per-quantizer
    ``codebook`` (nn.Embedding) and ``out_proj`` (1x1 conv, weight [D,cd,1])."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class _Q:
        def __init__(self):
            self.codebook = nn.Embedding(vocab, codebook_dim)
            self.out_proj = nn.Conv1d(codebook_dim, token_dim, 1)

    class _Quantizer:
        def __init__(self):
            self.quantizers = [_Q() for _ in range(num_codebooks)]

    class _Dac:
        def __init__(self):
            self.quantizer = _Quantizer()

    return _Dac()
