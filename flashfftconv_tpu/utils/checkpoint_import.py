"""Pretrained-checkpoint import: torch state dicts -> flax param pytrees.

TPU-native equivalent of the reference's HuggingFace checkpoint surgery for
HyenaDNA (/root/reference/examples/hyena-dna/huggingface.py:28-152): the
reference downloads a torch checkpoint, strips the ``model.`` prefix, undoes
the gradient-checkpointing ``.mixer.layer`` / ``.mlp.layer`` key injection
(huggingface.py:28-46) and copies tensors by name. Here the same surgery maps
the torch tensors into the param tree of
:class:`flashfftconv_tpu.models.lm.ConvLMHeadModel` (mixer="hyena"), with the
torch->flax layout changes (``nn.Linear`` weights transposed to Dense kernels,
``nn.Conv1d`` depthwise weights squeezed to ``(channels, K)``).

No network access is assumed: callers pass a local ``state_dict``-like mapping
(e.g. from ``torch.load(path, map_location="cpu")``) or a directory produced by
``git clone https://huggingface.co/LongSafari/<model>`` elsewhere.

Known deliberate differences (documented, verified by tests):
  - ``pos_emb.z`` / ``pos_emb.t`` are trainable in the reference (lr 1e-5,
    hyenadna_standalone.py:94-112) but are deterministic constants here with
    identical init values; pretrained z/t that drifted from init are reported
    in ``ImportReport.skipped`` rather than silently dropped.
  - The lm head is weight-tied in both stacks, so ``lm_head.weight`` is
    skipped in favor of the embedding table.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ImportReport:
    """What happened to each source key during an import."""

    used: list[str] = dataclasses.field(default_factory=list)
    skipped: list[str] = dataclasses.field(default_factory=list)
    missing: list[str] = dataclasses.field(default_factory=list)  # target paths left at init


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray | jax.Array -> float32 numpy (torch only
    imported if needed)."""
    if hasattr(t, "detach"):
        # torch tensor (cpu), without importing torch at module scope
        return np.asarray(t.detach().to("cpu").float().numpy())
    return np.asarray(t, dtype=np.float32)


def strip_checkpointing_keys(key: str) -> str:
    """Undo the gradient-checkpointing key injection (the inverse of the
    reference's ``inject_substring``, huggingface.py:28-46)."""
    key = re.sub(r"\.mixer\.layer\.", ".mixer.", key)
    key = re.sub(r"\.mlp\.layer\.", ".mlp.", key)
    return key


def normalize_state_dict(state: Mapping[str, Any]) -> dict[str, Any]:
    """Unwrap {'state_dict': ...}, strip ``model.`` prefixes and
    checkpointing-injected segments (huggingface.py:55-69)."""
    if "state_dict" in state and isinstance(state["state_dict"], Mapping):
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        k = strip_checkpointing_keys(k)
        if k.startswith("model."):
            k = k[len("model.") :]
        out[k] = v
    return out


def torch_linear(w) -> np.ndarray:
    """torch nn.Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return _np(w).T


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """torch.load a checkpoint file to cpu and normalize its keys."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return normalize_state_dict(state)


def _filter_params(
    state: dict, prefix: str, report: ImportReport, seq_attr: str = "implicit_filter"
) -> dict:
    """Map one HyenaFilter's torch params (``implicit_filter.{j}`` Sequential,
    ``bias``, ``modulation.deltas``) into our flax HyenaFilter tree.

    ``seq_attr`` selects the Sequential attribute — the reference M2-BERT
    filter stores the reverse filter's MLP as ``implicit_filter_rev`` INSIDE
    the same HyenaFilter (hyena_utils.py:195-203), while our flax build uses
    a second HyenaFilter module for it (models/m2_bert.py)."""
    out: dict[str, Any] = {}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
        report.used.append(f"{prefix}.bias")
    # Sequential indices map 1:1 onto our layers_{j} list (Dense/Sin/.../Dense).
    j = 0
    while True:
        wk = f"{prefix}.{seq_attr}.{j}.weight"
        fk = f"{prefix}.{seq_attr}.{j}.freq"
        if wk in state:
            layer = {"kernel": torch_linear(state[wk])}
            report.used.append(wk)
            bk = f"{prefix}.{seq_attr}.{j}.bias"
            if bk in state:
                layer["bias"] = _np(state[bk])
                report.used.append(bk)
            out[f"layers_{j}"] = layer
        elif fk in state:
            out[f"layers_{j}"] = {"freq": _np(state[fk])}
            report.used.append(fk)
        else:
            break
        j += 1
    dk = f"{prefix}.modulation.deltas"
    if dk in state:
        out["modulation"] = {"deltas": _np(state[dk])}
        report.used.append(dk)
    # pos_emb z/t are constants here (see module docstring).
    for name in ("z", "t"):
        k = f"{prefix}.pos_emb.{name}"
        if k in state:
            report.skipped.append(k)
    return out


def _mixer_params(state: dict, prefix: str, report: ImportReport) -> dict:
    out: dict[str, Any] = {}
    if f"{prefix}.in_proj.weight" in state:
        # Our in_proj param keeps the torch (out, in) orientation (it is
        # consumed by einsum("od,bdl"), models/hyena.py).
        out["in_proj"] = _np(state[f"{prefix}.in_proj.weight"])
        report.used.append(f"{prefix}.in_proj.weight")
    if f"{prefix}.in_proj.bias" in state:
        out["in_proj_b"] = _np(state[f"{prefix}.in_proj.bias"])
        report.used.append(f"{prefix}.in_proj.bias")
    if f"{prefix}.short_filter.weight" in state:
        w = _np(state[f"{prefix}.short_filter.weight"])  # (C, 1, K) depthwise
        out["short_filter"] = {"weights": w[:, 0, :]}
        report.used.append(f"{prefix}.short_filter.weight")
        if f"{prefix}.short_filter.bias" in state:
            out["short_filter"]["bias"] = _np(state[f"{prefix}.short_filter.bias"])
            report.used.append(f"{prefix}.short_filter.bias")
    filt = _filter_params(state, f"{prefix}.filter_fn", report)
    if filt:
        out["filter"] = filt
    if f"{prefix}.out_proj.weight" in state:
        out["out_proj"] = {"kernel": torch_linear(state[f"{prefix}.out_proj.weight"])}
        report.used.append(f"{prefix}.out_proj.weight")
        if f"{prefix}.out_proj.bias" in state:
            out["out_proj"]["bias"] = _np(state[f"{prefix}.out_proj.bias"])
            report.used.append(f"{prefix}.out_proj.bias")
    return out


def _norm(state: dict, prefix: str, report: ImportReport) -> dict:
    out = {}
    if f"{prefix}.weight" in state:
        out["scale"] = _np(state[f"{prefix}.weight"])
        report.used.append(f"{prefix}.weight")
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
        report.used.append(f"{prefix}.bias")
    return out


def hyenadna_to_flax(
    state: Mapping[str, Any], n_layer: int | None = None
) -> tuple[dict, ImportReport]:
    """Map a (normalized) HyenaDNA torch state dict onto the param tree of
    ``ConvLMHeadModel(mixer="hyena", mixer_kwargs={"in_proj_bias": True})``.

    Returns (params, report). ``params`` contains only imported leaves; merge
    over freshly-initialized params with :func:`merge_params` so anything the
    checkpoint lacks keeps its init value (and shows up in report.missing).
    """
    state = normalize_state_dict(state)
    report = ImportReport()

    if n_layer is None:
        layer_ids = {
            int(m.group(1))
            for k in state
            if (m := re.match(r"backbone\.layers\.(\d+)\.", k))
        }
        n_layer = max(layer_ids) + 1 if layer_ids else 0

    params: dict[str, Any] = {}
    emb_key = "backbone.embeddings.word_embeddings.weight"
    if emb_key in state:
        params["embeddings"] = {"embedding": _np(state[emb_key])}
        report.used.append(emb_key)

    backbone: dict[str, Any] = {}
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        block: dict[str, Any] = {}
        mixer = _mixer_params(state, f"{p}.mixer", report)
        if mixer:
            block["mixer"] = mixer
        for norm in ("norm1", "norm2"):
            n = _norm(state, f"{p}.{norm}", report)
            if n:
                block[norm] = n
        mlp = {}
        for fc in ("fc1", "fc2"):
            if f"{p}.mlp.{fc}.weight" in state:
                mlp[fc] = {"kernel": torch_linear(state[f"{p}.mlp.{fc}.weight"])}
                report.used.append(f"{p}.mlp.{fc}.weight")
                if f"{p}.mlp.{fc}.bias" in state:
                    mlp[fc]["bias"] = _np(state[f"{p}.mlp.{fc}.bias"])
                    report.used.append(f"{p}.mlp.{fc}.bias")
        if mlp:
            block["mlp"] = mlp
        if block:
            backbone[f"block_{i}"] = block
    ln_f = _norm(state, "backbone.ln_f", report)
    if ln_f:
        backbone["ln_f"] = ln_f
    if backbone:
        params["backbone"] = backbone

    handled = set(report.used) | set(report.skipped)
    for k in state:
        if k in handled:
            continue
        # lm_head is tied to the embedding; heads for downstream tasks are
        # intentionally not part of the backbone import.
        report.skipped.append(k)
    return params, report


def merge_params(init_params: Any, imported: dict, report: ImportReport | None = None):
    """Overlay imported leaves onto an initialized param tree; leaves absent
    from ``imported`` keep their init values (recorded in report.missing)."""

    def rec(init_node, imp_node, path):
        if not isinstance(init_node, (dict, Mapping)):
            if imp_node is None:
                if report is not None:
                    report.missing.append(path)
                return init_node
            arr = jnp.asarray(imp_node)
            if arr.shape != jnp.shape(init_node):
                raise ValueError(
                    f"shape mismatch at {path}: checkpoint {arr.shape} "
                    f"vs model {jnp.shape(init_node)}"
                )
            return arr.astype(jnp.asarray(init_node).dtype)
        out = {}
        for k, v in init_node.items():
            sub = imp_node.get(k) if isinstance(imp_node, (dict, Mapping)) else None
            out[k] = rec(v, sub, f"{path}/{k}" if path else k)
        return out

    return rec(init_params, imported, "")


# --------------------------------------------------------------------------
# GPT-2 (HuggingFace transformers) -> models.gpt.GPTLMHeadModel
# --------------------------------------------------------------------------

def import_gpt2_state_dict(
    state: Mapping[str, Any],
    n_layer: int,
    pad_vocab_size_multiple: int = 8,
) -> tuple[dict, ImportReport]:
    """Map a HuggingFace ``GPT2LMHeadModel`` torch state dict onto the param
    tree of :class:`flashfftconv_tpu.models.gpt.GPTLMHeadModel` — the analog
    of the reference's GPT-2 checkpoint remap
    (flash_attn/models/gpt.py:remap_state_dict_gpt2, exercised by its
    tests/models/test_gpt.py HF-parity tests).

    HF stores attention/MLP projections as ``Conv1D`` with weights already in
    (in, out) layout, so they copy straight into Dense kernels without the
    nn.Linear transpose; the qkv concatenation order (q;k;v) and per-head
    reshape match MHAOperator's. ``lm_head.weight`` is skipped (weight-tied);
    the embedding table is zero-padded to ``pad_vocab_size_multiple``.
    """
    report = ImportReport()
    state = {
        (k[len("transformer.") :] if k.startswith("transformer.") else k): v
        for k, v in normalize_state_dict(state).items()
    }

    def take(key: str) -> np.ndarray:
        report.used.append(key)
        return _np(state[key])

    def norm(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def dense(prefix: str) -> dict:
        return {"kernel": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    wte = take("wte.weight")
    v, d = wte.shape
    pad = (-v) % pad_vocab_size_multiple
    if pad:
        wte = np.concatenate([wte, np.zeros((pad, d), np.float32)])
    params: dict[str, Any] = {
        "embeddings": {"embedding": wte},
        "pos_embeddings": take("wpe.weight"),
        "ln_f": norm("ln_f"),
    }
    for i in range(n_layer):
        p = f"h.{i}"
        params[f"block_{i}"] = {
            "norm1": norm(f"{p}.ln_1"),
            "norm2": norm(f"{p}.ln_2"),
            "mixer": {
                "qkv_proj": dense(f"{p}.attn.c_attn"),
                "out_proj": dense(f"{p}.attn.c_proj"),
            },
            "mlp": {
                "fc1": dense(f"{p}.mlp.c_fc"),
                "fc2": dense(f"{p}.mlp.c_proj"),
            },
        }

    handled = set(report.used)
    for k in state:
        if k not in handled:
            # lm_head.weight (tied), attn.bias/attn.masked_bias mask buffers
            report.skipped.append(k)
    return params, report


def import_opt_state_dict(
    state: Mapping[str, Any],
    n_layer: int,
    pad_vocab_size_multiple: int = 8,
) -> tuple[dict, ImportReport]:
    """Map a HuggingFace ``OPTForCausalLM`` torch state dict onto
    :class:`flashfftconv_tpu.models.gpt.GPTLMHeadModel` (use
    ``mlp_activation="relu"``; ``embed_dim=word_embed_proj_dim`` when it
    differs from hidden_size) — the analog of the reference's
    remap_state_dict_opt (flash_attn/models/opt.py:14-81, exercised by its
    tests/models/test_opt.py).

    OPT stores separate q/k/v nn.Linear projections; they are transposed and
    concatenated (q;k;v) into the fused qkv kernel. OPT's learned positional
    table carries a 2-row offset (OPTLearnedPositionalEmbedding) — the first
    two rows are dropped. ``lm_head.weight`` is tied and skipped.
    """
    report = ImportReport()
    state = {
        (k[len("decoder.") :] if k.startswith("decoder.") else k): v
        for k, v in normalize_state_dict(state).items()
    }

    def take(key: str) -> np.ndarray:
        report.used.append(key)
        return _np(state[key])

    def norm(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def linear(prefix: str, bias: bool = True) -> dict:
        out = {"kernel": torch_linear(state[f"{prefix}.weight"])}
        report.used.append(f"{prefix}.weight")
        if bias and f"{prefix}.bias" in state:
            out["bias"] = take(f"{prefix}.bias")
        return out

    wte = take("embed_tokens.weight")
    v = wte.shape[0]
    pad = (-v) % pad_vocab_size_multiple
    if pad:
        wte = np.concatenate([wte, np.zeros((pad, wte.shape[1]), np.float32)])
    params: dict[str, Any] = {
        "embeddings": {"embedding": wte},
        # OPTLearnedPositionalEmbedding offset: rows 0-1 are never addressed
        # for position ids 0..L-1 with a dense attention mask.
        "pos_embeddings": take("embed_positions.weight")[2:],
        "ln_f": norm("final_layer_norm"),
    }
    for proj in ("project_in", "project_out"):
        if f"{proj}.weight" in state:
            params[proj] = linear(proj, bias=False)
    for i in range(n_layer):
        p = f"layers.{i}"
        qkv_k = np.concatenate(
            [torch_linear(state[f"{p}.self_attn.{n}_proj.weight"]) for n in "qkv"],
            axis=1,
        )
        qkv_b = np.concatenate([_np(state[f"{p}.self_attn.{n}_proj.bias"]) for n in "qkv"])
        report.used += [f"{p}.self_attn.{n}_proj.{w}" for n in "qkv" for w in ("weight", "bias")]
        params[f"block_{i}"] = {
            "norm1": norm(f"{p}.self_attn_layer_norm"),
            "norm2": norm(f"{p}.final_layer_norm"),
            "mixer": {
                "qkv_proj": {"kernel": qkv_k, "bias": qkv_b},
                "out_proj": linear(f"{p}.self_attn.out_proj"),
            },
            "mlp": {"fc1": linear(f"{p}.fc1"), "fc2": linear(f"{p}.fc2")},
        }

    handled = set(report.used)
    for k in state:
        if k not in handled:
            report.skipped.append(k)  # lm_head.weight (tied)
    return params, report


def import_vit_state_dict(
    state: Mapping[str, Any],
    n_layer: int,
) -> tuple[dict, ImportReport]:
    """Map a HuggingFace ``ViTForImageClassification`` torch state dict onto
    :class:`flashfftconv_tpu.models.vit.VisionTransformer` — the analog of
    the reference's timm-checkpoint ViT parity (flash_attn/models/vit.py,
    tests/models/test_vit.py).

    The separate query/key/value Linears fuse into the qkv kernel; the
    Conv2d patch projection transposes NCHW (d,c,p,p) -> flax HWIO
    (p,p,c,d); position embeddings keep their CLS row.
    """
    report = ImportReport()
    state = {
        (k[len("vit.") :] if k.startswith("vit.") else k): v
        for k, v in normalize_state_dict(state).items()
    }

    def take(key: str) -> np.ndarray:
        report.used.append(key)
        return _np(state[key])

    def norm(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def linear(prefix: str) -> dict:
        out = {"kernel": torch_linear(state[f"{prefix}.weight"])}
        report.used.append(f"{prefix}.weight")
        if f"{prefix}.bias" in state:
            out["bias"] = take(f"{prefix}.bias")
        return out

    params: dict[str, Any] = {
        "cls_token": take("embeddings.cls_token"),  # (1, 1, d)
        "pos_embeddings": take("embeddings.position_embeddings")[0],
        "patch_embed": {
            "kernel": take("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
            "bias": take("embeddings.patch_embeddings.projection.bias"),
        },
        "ln_f": norm("layernorm"),
        "head": linear("classifier"),
    }
    for i in range(n_layer):
        p = f"encoder.layer.{i}"
        qkv_k = np.concatenate(
            [torch_linear(state[f"{p}.attention.attention.{n}.weight"]) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [_np(state[f"{p}.attention.attention.{n}.bias"]) for n in ("query", "key", "value")]
        )
        report.used += [
            f"{p}.attention.attention.{n}.{w}"
            for n in ("query", "key", "value") for w in ("weight", "bias")
        ]
        params[f"block_{i}"] = {
            "norm1": norm(f"{p}.layernorm_before"),
            "norm2": norm(f"{p}.layernorm_after"),
            "mixer": {
                "qkv_proj": {"kernel": qkv_k, "bias": qkv_b},
                "out_proj": linear(f"{p}.attention.output.dense"),
            },
            "mlp": {
                "fc1": linear(f"{p}.intermediate.dense"),
                "fc2": linear(f"{p}.output.dense"),
            },
        }

    handled = set(report.used)
    for k in state:
        if k not in handled:
            report.skipped.append(k)
    return params, report


def import_bert_state_dict(
    state: Mapping[str, Any],
    n_layer: int,
) -> tuple[dict, ImportReport]:
    """Map a HuggingFace ``BertForMaskedLM`` torch state dict onto
    :class:`flashfftconv_tpu.models.bert.BertForMaskedLM` — the analog of
    the reference's remap_state_dict (flash_attn/models/bert.py, exercised
    by tests/models/test_bert.py).

    query/key/value Linears fuse into the qkv kernel; the tied MLM decoder
    weight is skipped in favor of the embedding table; ``cls.predictions
    .bias`` lands in ``mlm_bias``; position_ids buffers and the (absent in
    our MLM model) pooler are skipped.
    """
    report = ImportReport()
    state = normalize_state_dict(state)

    def take(key: str) -> np.ndarray:
        report.used.append(key)
        return _np(state[key])

    def norm(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def linear(prefix: str) -> dict:
        out = {"kernel": torch_linear(state[f"{prefix}.weight"])}
        report.used.append(f"{prefix}.weight")
        if f"{prefix}.bias" in state:
            out["bias"] = take(f"{prefix}.bias")
        return out

    bert: dict[str, Any] = {
        "position_embeddings": {"embedding": take("bert.embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": take("bert.embeddings.token_type_embeddings.weight")},
        "embed_norm": norm("bert.embeddings.LayerNorm"),
    }
    for i in range(n_layer):
        p = f"bert.encoder.layer.{i}"
        qkv_k = np.concatenate(
            [torch_linear(state[f"{p}.attention.self.{n}.weight"]) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [_np(state[f"{p}.attention.self.{n}.bias"]) for n in ("query", "key", "value")]
        )
        report.used += [
            f"{p}.attention.self.{n}.{w}"
            for n in ("query", "key", "value") for w in ("weight", "bias")
        ]
        bert[f"layer_{i}"] = {
            "mixer": {
                "qkv_proj": {"kernel": qkv_k, "bias": qkv_b},
                "out_proj": linear(f"{p}.attention.output.dense"),
            },
            "norm1": norm(f"{p}.attention.output.LayerNorm"),
            "fc1": linear(f"{p}.intermediate.dense"),
            "fc2": linear(f"{p}.output.dense"),
            "norm2": norm(f"{p}.output.LayerNorm"),
        }

    params: dict[str, Any] = {
        "word_embeddings": {"embedding": take("bert.embeddings.word_embeddings.weight")},
        "bert": bert,
        "mlm_transform": linear("cls.predictions.transform.dense"),
        "mlm_norm": norm("cls.predictions.transform.LayerNorm"),
        "mlm_bias": take("cls.predictions.bias"),
    }

    handled = set(report.used)
    for k in state:
        if k not in handled:
            # position_ids buffers, tied cls.predictions.decoder.*, pooler
            report.skipped.append(k)
    return params, report


# --------------------------------------------------------------------------
# M2-BERT (reference examples/bert) -> models.bert.M2BertForMaskedLM
# --------------------------------------------------------------------------

def _m2_mixer_params(state: dict, prefix: str, report: ImportReport) -> dict:
    """Map one MonarchMixerSequenceMixing's torch params
    (/root/reference/examples/bert/monarch_mixer_sequence_mixer_flashfftconv.py:42-115)
    onto our flax mixer tree (models/m2_bert.py)."""
    out: dict[str, Any] = {}
    if f"{prefix}.in_linear.weight" in state:
        # Kept in torch (out, in) orientation — consumed by einsum("od,bdl").
        out["in_linear"] = _np(state[f"{prefix}.in_linear.weight"])
        report.used.append(f"{prefix}.in_linear.weight")
    # The reference registers an in_linear bias but its forward drops it
    # (monarch_mixer...py:124-126: `self.in_linear.weight @ u`, bias line
    # commented out); our mixer has no such param.
    if f"{prefix}.in_linear.bias" in state:
        report.skipped.append(f"{prefix}.in_linear.bias")
    if f"{prefix}.short_filter.weights" in state:
        # FlashDepthWiseConv1d stores BHL weights squeezed to (C, K)
        # (depthwise_1d.py:33-35) — same layout as our ShortDepthwiseConv.
        out["short_filter"] = {"weights": _np(state[f"{prefix}.short_filter.weights"])}
        report.used.append(f"{prefix}.short_filter.weights")
        if f"{prefix}.short_filter.bias" in state:
            out["short_filter"]["bias"] = _np(state[f"{prefix}.short_filter.bias"])
            report.used.append(f"{prefix}.short_filter.bias")
    # Implicit filters. Reference: one bidirectional HyenaFilter holds both
    # MLPs (implicit_filter + implicit_filter_rev); ours are two modules.
    for ref_fn, ours in (("filter_fn", "filter"), ("filter_fn2", "filter2")):
        fwd = _filter_params(state, f"{prefix}.{ref_fn}", report)
        if fwd:
            out[ours] = fwd
        rev = _filter_params(
            state, f"{prefix}.{ref_fn}", report, seq_attr="implicit_filter_rev"
        )
        rev.pop("bias", None)  # shared bias/modulation live on the fwd filter
        rev.pop("modulation", None)
        if rev:
            out[f"{ours}_rev"] = rev
    # Inference mode: the kernel is a plain (d_model, filter_len) weight
    # (monarch_mixer...py:56-63); filter_bias is unused by the mixer forward.
    for ref_k, ours in (("filter", "filter"), ("filter2", "filter2")):
        if f"{prefix}.{ref_k}" in state:
            out[ours] = _np(state[f"{prefix}.{ref_k}"])
            report.used.append(f"{prefix}.{ref_k}")
        if f"{prefix}.{ref_k}_bias" in state:
            report.skipped.append(f"{prefix}.{ref_k}_bias")
    if f"{prefix}.out_linear.weight" in state:
        out["out_linear"] = {"kernel": torch_linear(state[f"{prefix}.out_linear.weight"])}
        report.used.append(f"{prefix}.out_linear.weight")
        if f"{prefix}.out_linear.bias" in state:
            out["out_linear"]["bias"] = _np(state[f"{prefix}.out_linear.bias"])
            report.used.append(f"{prefix}.out_linear.bias")
    return out


def _m2_mlp_linear(state: dict, key: str, report: ImportReport) -> dict:
    """One M2 MLP linear: BlockdiagLinear weights (nblocks, q, p) map 1:1 onto
    our BlockdiagLinear 'weight'; dense (out, in) weights become Dense
    kernels. (bert_layers.py:130-219: linear_cls is Blockdiag or nn.Linear.)"""
    w = _np(state[f"{key}.weight"])
    report.used.append(f"{key}.weight")
    out = {"weight": w} if w.ndim == 3 else {"kernel": w.T}
    if f"{key}.bias" in state:
        out["bias"] = _np(state[f"{key}.bias"])
        report.used.append(f"{key}.bias")
    return out


def import_m2_bert_state_dict(
    state: Mapping[str, Any], n_layer: int | None = None
) -> tuple[dict, ImportReport]:
    """Map a reference M2-BERT torch state dict (examples/bert/bert_layers.py:
    BertForMaskedLM over MonarchMixerSequenceMixingFlashFFTConv) onto the
    param tree of ``M2BertForMaskedLM(ref_structure=True)``.

    ``ref_structure=True`` is required for functional fidelity: the reference
    BertLayer has no residual/LayerNorm around the mixer (bert_layers.py:
    277-283) — its only per-layer norm is the post-MLP one, which maps to our
    ``norm2``. Merge the result over initialized params with
    :func:`merge_params`. For a dense-MLP target model (``mlp_nblocks=0``),
    convert the tree afterwards with :func:`blockdiag_to_dense_mlp`.
    """
    state = normalize_state_dict(state)
    report = ImportReport()

    if n_layer is None:
        layer_ids = {
            int(m.group(1))
            for k in state
            if (m := re.match(r"bert\.encoder\.layer\.(\d+)\.", k))
        }
        n_layer = max(layer_ids) + 1 if layer_ids else 0

    bert: dict[str, Any] = {}
    emb = "bert.embeddings"
    for ref_k, ours in (
        (f"{emb}.word_embeddings.weight", "word_embeddings"),
        (f"{emb}.position_embeddings.weight", "position_embeddings"),
        (f"{emb}.token_type_embeddings.weight", "token_type_embeddings"),
    ):
        if ref_k in state:
            bert[ours] = {"embedding": _np(state[ref_k])}
            report.used.append(ref_k)
    en = _norm(state, f"{emb}.LayerNorm", report)
    if en:
        bert["embed_norm"] = en

    for i in range(n_layer):
        p = f"bert.encoder.layer.{i}"
        block: dict[str, Any] = {}
        mixer = _m2_mixer_params(state, f"{p}.attention", report)
        if mixer:
            block["mixer"] = mixer
        mlp_ln = _norm(state, f"{p}.mlp.layernorm", report)
        if mlp_ln:
            block["norm2"] = mlp_ln
        if f"{p}.mlp.gated_layers.weight" in state:
            block["mlp_fc1"] = _m2_mlp_linear(state, f"{p}.mlp.gated_layers", report)
        if f"{p}.mlp.wo.weight" in state:
            block["mlp_fc2"] = _m2_mlp_linear(state, f"{p}.mlp.wo", report)
        if block:
            bert[f"layer_{i}"] = block

    params: dict[str, Any] = {"bert": bert} if bert else {}
    if "cls.predictions.transform.dense.weight" in state:
        params["mlm_transform"] = {
            "kernel": torch_linear(state["cls.predictions.transform.dense.weight"]),
            "bias": _np(state["cls.predictions.transform.dense.bias"]),
        }
        report.used += [
            "cls.predictions.transform.dense.weight",
            "cls.predictions.transform.dense.bias",
        ]
    tn = _norm(state, "cls.predictions.transform.LayerNorm", report)
    if tn:
        params["mlm_norm"] = tn
    if "cls.predictions.decoder.weight" in state:
        head = {"kernel": torch_linear(state["cls.predictions.decoder.weight"])}
        report.used.append("cls.predictions.decoder.weight")
        if "cls.predictions.bias" in state:
            head["bias"] = _np(state["cls.predictions.bias"])
            report.used.append("cls.predictions.bias")
        params["mlm_head"] = head

    handled = set(report.used) | set(report.skipped)
    for k in state:
        if k not in handled:
            # pooler, pos_emb buffers, seq_relationship head, etc.
            report.skipped.append(k)
    return params, report


# --------------------------------------------------------------------------
# Checkpoint surgery: blockdiag -> dense MLP conversion, positional-embedding
# interpolation (reference training/src/utils/checkpoint.py:32-67 and
# examples/bert/blockdiag_multiply.py:9-16).
# --------------------------------------------------------------------------

def blockdiag_weight_to_dense_weight(weight) -> np.ndarray:
    """(nblocks, q, p) block-diagonal weight -> equivalent dense torch-layout
    (out, in) = (nblocks*q, nblocks*p) weight. Mirrors the reference's
    ``torch.block_diag(*torch.unbind(weight, 0))``
    (blockdiag_multiply.py:9-16)."""
    w = _np(weight)
    nblocks, q, p = w.shape
    dense = np.zeros((nblocks * q, nblocks * p), dtype=w.dtype)
    for i in range(nblocks):
        dense[i * q : (i + 1) * q, i * p : (i + 1) * p] = w[i]
    return dense


def blockdiag_to_dense_mlp(params):
    """Convert every BlockdiagLinear MLP leaf in a flax param tree into the
    equivalent Dense params, so a Monarch-MLP (mlp_nblocks>0) checkpoint
    loads into a dense-MLP (mlp_nblocks=0) model — the TPU analog of the
    reference's ``blockdiag_to_dense_mlp_bert``
    (training/src/utils/checkpoint.py:32-39). A BlockdiagLinear node is any
    mapping with a rank-3 'weight'; it becomes {'kernel': dense.T[, 'bias']}.
    """

    def rec(node):
        if not isinstance(node, Mapping):
            return node
        w = node.get("weight")
        if w is not None and not isinstance(w, Mapping) and np.ndim(w) == 3:
            out = {"kernel": blockdiag_weight_to_dense_weight(w).T}
            if "bias" in node:
                out["bias"] = _np(node["bias"])
            return out
        return {k: rec(v) for k, v in node.items()}

    return rec(params)


def interpolate_pos_embedding(emb, out_seqlen: int, interleave: bool = False):
    """Extend a positional embedding (..., L, D) to (..., out_seqlen, D) by
    tiling whole copies along the sequence axis, or (interleave=True, square
    lengths) by 2-D nearest-neighbor upsampling of the (sqrt(L), sqrt(L))
    grid — the reference's ``interpolate_pos_embedding``
    (training/src/utils/checkpoint.py:41-67), used to warm-start long-context
    models from short-context checkpoints."""
    e = _np(emb)
    length, d = e.shape[-2], e.shape[-1]
    if out_seqlen % length:
        raise ValueError(f"out_seqlen {out_seqlen} must be a multiple of {length}")
    reps = out_seqlen // length
    if not interleave:
        tile = [1] * e.ndim
        tile[-2] = reps
        return np.tile(e, tile)
    side = math.isqrt(length)
    out_side = math.isqrt(out_seqlen)
    r = math.isqrt(reps)
    if side * side != length or out_side * out_side != out_seqlen or r * r != reps:
        raise ValueError("interleave requires square seqlens and a square ratio")
    grid = e.reshape(*e.shape[:-2], side, side, d)
    grid = np.repeat(np.repeat(grid, r, axis=-3), r, axis=-2)
    return grid.reshape(*e.shape[:-2], out_seqlen, d)


def stack_block_params(params, n_layer: int):
    """Convert a per-block param tree (backbone/block_{i}/...) into the
    scan-over-blocks layout (backbone/blocks/... with a leading n_layer axis)
    used when ``LMBackbone(scan_blocks=True)`` (models/lm.py).

    Inverse direction: :func:`unstack_block_params`. Both let checkpoints
    trained in one layout load into the other (the reference's analog is the
    ``.mixer.layer`` key surgery in hyena-dna/huggingface.py:28-46 — here the
    layouts differ by stacking, not naming).
    """
    import jax

    bb = dict(params["backbone"])
    blocks = [bb.pop(f"block_{i}") for i in range(n_layer)]
    bb["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack([_np(x) for x in xs]), *blocks
    )
    out = dict(params)
    out["backbone"] = bb
    return out


def unstack_block_params(params, n_layer: int):
    """Inverse of :func:`stack_block_params`."""
    import jax

    bb = dict(params["backbone"])
    stacked = bb.pop("blocks")
    for i in range(n_layer):
        bb[f"block_{i}"] = jax.tree_util.tree_map(lambda x: _np(x)[i], stacked)
    out = dict(params)
    out["backbone"] = bb
    return out
