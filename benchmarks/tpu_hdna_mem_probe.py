"""AOT memory probe for the HyenaDNA-1M train step (compile-only, chipless).

Compiles the exact train step of examples/hyena_dna/train.py --model
large-1m through the remote TPU compile helper and prints XLA's static
memory analysis — no chip execution, so it can run during relay outages
and doesn't contend with benchmark jobs. Iterate memory levers here:

  FLASHFFTCONV_DW_BWD=fused        Pallas depthwise bwd (no padded-layout
                                   conv-backward temps)
  FLASHFFTCONV_FACTORS=2097152:... single-pass 2M conv plan (fori bwd)
  HDNA_MEM_SCAN=0                  disable scan-over-blocks (r4 baseline)
  HDNA_MEM_HCHUNKS=N               chunk the long conv over channels
  HDNA_MEM_SHORT=pallas            pin the short filter to the Pallas
                                   kernels (fwd + fused bwd)

Usage: python benchmarks/tpu_hdna_mem_probe.py [l_max]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flashfftconv_tpu.models.lm import ConvLMHeadModel
from flashfftconv_tpu.utils.metrics import cross_entropy
from flashfftconv_tpu.utils.train import TrainState, create_train_state


def main():
    l_max = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    scan = os.environ.get("HDNA_MEM_SCAN", "1") == "1"
    n_layer = int(os.environ.get("HDNA_MEM_LAYERS", "8"))
    model = ConvLMHeadModel(
        d_model=256, n_layer=n_layer, d_inner=1024, vocab_size=5, l_max=l_max,
        mixer="hyena",
        mixer_kwargs={"impl": "auto",
                      "filter_args": {
                          "emb_dim": 5,
                          **({"mlp_dtype": jnp.bfloat16}
                             if os.environ.get("HDNA_MEM_FILTMLP") == "1" else {})},
                      "conv_h_chunks": int(os.environ.get("HDNA_MEM_HCHUNKS", "0")),
                      "proj_l_chunks": int(os.environ.get("HDNA_MEM_PROJCHUNKS", "0")),
                      "short_filter_impl": os.environ.get("HDNA_MEM_SHORT") or None,
                      "proj_out_f32": os.environ.get("HDNA_MEM_PROJF32") == "1",
                      "filter_output_dtype":
                          jnp.bfloat16 if os.environ.get("HDNA_MEM_KBF16") == "1"
                          else None},
        remat=True, scan_blocks=scan,
        inner_remat=os.environ.get("HDNA_MEM_INNER", "0") == "1",
        ln_f_f32=os.environ.get("HDNA_MEM_LNF32", "1") == "1",
        mlp_l_chunks=int(os.environ.get("HDNA_MEM_MLPCHUNKS", "0")),
        residual_f32=os.environ.get("HDNA_MEM_RES32", "1") == "1",
        dtype=jnp.bfloat16,
        pad_vocab_size_multiple=8,
    )
    ids = jnp.zeros((1, l_max), jnp.int32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids))["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(6e-4, weight_decay=0.1))
    state = create_train_state(params, tx)

    def step_fn(state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, deterministic=True)
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state), loss

    y = jnp.zeros((1, l_max), jnp.int32)
    print(f"compiling train step: L={l_max} scan={scan} layers={n_layer} "
          f"DW_BWD={os.environ.get('FLASHFFTCONV_DW_BWD', 'xla')} "
          f"FACTORS={os.environ.get('FLASHFFTCONV_FACTORS', '')}", flush=True)
    opts = {}
    if os.environ.get("HDNA_MEM_NO_LHS") == "1":
        # The latency-hiding scheduler overlaps ops at the cost of longer
        # buffer lifetimes; a memory-minimizing schedule can cut the peak
        # by GBs on a barely-fitting step (at some throughput cost).
        opts["xla_tpu_enable_latency_hiding_scheduler"] = "false"
    compiled = (jax.jit(step_fn).lower(state, ids, y)
                .compile(compiler_options=opts or None))
    a = compiled.memory_analysis()
    tot = (a.temp_size_in_bytes + a.output_size_in_bytes
           + a.argument_size_in_bytes) / 2**30
    print(f"temp {a.temp_size_in_bytes/2**30:.2f} G | "
          f"args {a.argument_size_in_bytes/2**30:.2f} G | "
          f"out {a.output_size_in_bytes/2**30:.2f} G | "
          f"TOTAL {tot:.2f} G (chip budget 15.75 G)", flush=True)


if __name__ == "__main__":
    main()
