"""Checkpoint vocab expansion: grow embedding (and unembedding) rows.

Reference: vocab_expansion/expand_embedder.py:35 add_embeddings — grows
``token_embedder.embedding`` by N rows with trunc-normal(0.02) init,
PRNGKey(67), and re-saves the checkpoint at step 0. Here the operation is a
pure params->params transform plus CLI glue, and also grows the
``logits_dense`` kernel when logits are untied.

CLI::

    python -m maxtext_indextts2_tpu.vocab.expand \
        --in_path ckpt/params --out_path ckpt_expanded/params --num_new_rows 2048
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEED = 67
DEFAULT_INIT_SCALE = 0.02


def expand_embeddings(
    params,
    num_new_rows: int,
    seed: int = DEFAULT_SEED,
    init_scale: float = DEFAULT_INIT_SCALE,
):
    """Return params with the vocab dimension grown by ``num_new_rows``.

    Grows ``token_embedder.embedding`` ([V, E] -> [V+N, E]) and, if present,
    ``logits_dense.kernel`` ([E, V] -> [E, V+N]).
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    key = jax.random.PRNGKey(seed)
    k_emb, k_logits = jax.random.split(key)

    def grow(tree):
        tree = dict(tree)
        emb_tree = dict(tree["token_embedder"])
        emb = emb_tree["embedding"]
        new = (
            jax.random.truncated_normal(
                k_emb, -2.0, 2.0, (num_new_rows, emb.shape[1]), jnp.float32
            )
            * init_scale
        ).astype(emb.dtype)
        emb_tree["embedding"] = jnp.concatenate([emb, new], axis=0)
        tree["token_embedder"] = emb_tree
        if "logits_dense" in tree:
            ld = dict(tree["logits_dense"])
            kern = ld["kernel"]
            new_cols = (
                jax.random.truncated_normal(
                    k_logits, -2.0, 2.0, (kern.shape[0], num_new_rows), jnp.float32
                )
                * init_scale
            ).astype(kern.dtype)
            ld["kernel"] = jnp.concatenate([kern, new_cols], axis=1)
            tree["logits_dense"] = ld
        return tree

    if "params" in params:
        return {**params, "params": grow(params["params"])}
    return grow(params)


def main(argv=None):
    import argparse

    from maxtext_indextts2_tpu.train.checkpointing import (
        load_params_only,
        save_params_only,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--in_path", required=True)
    p.add_argument("--out_path", required=True)
    p.add_argument("--num_new_rows", type=int, default=2048)
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    args = p.parse_args(argv)

    params = load_params_only(args.in_path)
    expanded = expand_embeddings(params, args.num_new_rows, seed=args.seed)
    save_params_only(args.out_path, expanded)
    emb = (
        expanded["params"]["token_embedder"]["embedding"]
        if "params" in expanded
        else expanded["token_embedder"]["embedding"]
    )
    print(f"expanded embedding to {emb.shape}")


if __name__ == "__main__":
    main()
