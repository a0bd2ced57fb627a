"""String-keyed registry + config instantiation.

The TPU port of the reference's `_name_`-keyed registry indirection
(/root/reference/examples/hyena/src/utils/registry.py with
src/utils/config.py's ``instantiate``): configs refer to components by short
names; ``instantiate`` resolves the name, merges config kwargs with call-site
kwargs, and constructs the object. Used by the example configs (plain
dataclass/dict configs instead of Hydra, per SURVEY.md §5.6).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

_REGISTRIES: dict[str, dict[str, str | Callable]] = {
    "layer": {
        "hyena": "flashfftconv_tpu.models.hyena.HyenaOperator",
        "h3": "flashfftconv_tpu.models.h3.H3Operator",
        "m2": "flashfftconv_tpu.models.m2_bert.MonarchMixerSequenceMixing",
        "long-conv": "flashfftconv_tpu.models.long_conv.LongConv",
        "hyena-filter": "flashfftconv_tpu.models.filters.HyenaFilter",
        "mha": "flashfftconv_tpu.models.attention.MHAOperator",
        "s4d-kernel": "flashfftconv_tpu.models.ssm.S4DKernel",
        "long-conv-kernel": "flashfftconv_tpu.models.h3.LongConvKernel",
        "block-fft": "flashfftconv_tpu.models.ssm.BlockFFT",
    },
    "encoder": {
        "linear": "flashfftconv_tpu.models.sequence.LinearEncoder",
        "embedding": "flashfftconv_tpu.models.sequence.EmbeddingEncoder",
        "one-hot": "flashfftconv_tpu.models.sequence.OneHotEncoder",
        "position": "flashfftconv_tpu.models.sequence.PositionalEncoder",
        "patch2d": "flashfftconv_tpu.models.sequence.PatchEncoder",
    },
    "decoder": {
        "sequence": "flashfftconv_tpu.models.sequence.SequenceDecoder",
        "retrieval": "flashfftconv_tpu.models.sequence.RetrievalDecoder",
    },
    "pool": {
        "avg": "flashfftconv_tpu.models.sequence.DownAvgPool",
        "linear": "flashfftconv_tpu.models.sequence.DownLinearPool",
        "up-linear": "flashfftconv_tpu.models.sequence.UpLinearPool",
        "spectral": "flashfftconv_tpu.models.sequence.DownSpectralPool",
    },
    "model": {
        "sequence": "flashfftconv_tpu.models.sequence.SequenceModel",
        "lm": "flashfftconv_tpu.models.lm.ConvLMHeadModel",
        "lm-backbone": "flashfftconv_tpu.models.lm.LMBackbone",
        "long-conv-model": "flashfftconv_tpu.models.long_conv.LongConvModel",
        "gpt": "flashfftconv_tpu.models.gpt.GPTLMHeadModel",
        "opt": "flashfftconv_tpu.models.gpt.opt_lm",
        "vit": "flashfftconv_tpu.models.vit.VisionTransformer",
        "bert": "flashfftconv_tpu.models.bert.M2BertForMaskedLM",
        "m2-bert": "flashfftconv_tpu.models.bert.M2BertModel",
        "bert-attn": "flashfftconv_tpu.models.bert.BertForMaskedLM",
        "bert-attn-model": "flashfftconv_tpu.models.bert.BertModel",
    },
    "optimizer": {
        "adamw": "optax.adamw",
        "adam": "optax.adam",
        "sgd": "optax.sgd",
        "lamb": "optax.lamb",
    },
    "scheduler": {
        "cosine": "optax.cosine_decay_schedule",
        "constant": "optax.constant_schedule",
        "warmup-cosine": "optax.warmup_cosine_decay_schedule",
        "linear": "optax.linear_schedule",
        "exponential": "optax.exponential_decay",
        "warmup-exponential": "optax.warmup_exponential_decay_schedule",
        "sgdr": "optax.sgdr_schedule",
        "piecewise": "optax.piecewise_constant_schedule",
    },
}


def register(kind: str, name: str, target: str | Callable) -> None:
    _REGISTRIES.setdefault(kind, {})[name] = target


def lookup(kind: str, name: str) -> Callable:
    try:
        target = _REGISTRIES[kind][name]
    except KeyError:
        known = sorted(_REGISTRIES.get(kind, {}))
        raise KeyError(f"unknown {kind} {name!r}; known: {known}") from None
    if callable(target):
        return target
    module, attr = target.rsplit(".", 1)
    return getattr(importlib.import_module(module), attr)


def instantiate(kind: str, config: dict | str, **kwargs: Any):
    """Construct a registered component from a config dict with a ``_name_``
    key (remaining keys become constructor kwargs, call-site kwargs win)."""
    if isinstance(config, str):
        config = {"_name_": config}
    cfg = dict(config)
    name = cfg.pop("_name_")
    cls = lookup(kind, name)
    return cls(**{**cfg, **kwargs})
