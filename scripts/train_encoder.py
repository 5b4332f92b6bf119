"""Fine-tune the on-TPU encoder on a collection's own chunks (ICT).

End-to-end loop: harvest inverse-cloze pairs from an indexed collection,
train the dual encoder contrastively, save a checkpoint the engine can
load as its embedder.

    python scripts/train_encoder.py <data_dir> <collection_id> \
        [steps] [out_path]
"""

from __future__ import annotations

import sys

import jax
import numpy as np


def main() -> None:
    from super_rag_tpu.config import Settings
    from super_rag_tpu.engine.manager import EngineManager
    from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
    from super_rag_tpu.models.encoder_service import save_params
    from super_rag_tpu.models.tokenization import HashTokenizer
    from super_rag_tpu.store.db import Database
    from super_rag_tpu.train.contrastive import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from super_rag_tpu.train.pairs import pairs_from_engine, pairs_to_batches
    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    data_dir = sys.argv[1]
    collection_id = sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    out = sys.argv[4] if len(sys.argv) > 4 else f"{data_dir}/encoder_ckpt"

    cfg = Settings(data_dir=data_dir)
    db = Database(cfg.resolved_db_path())
    coll = db.get_collection(collection_id)
    assert coll is not None, f"collection {collection_id} not found"
    engines = EngineManager(cfg)
    engine = engines.get(collection_id, coll["config"])
    assert engine.index.size > 0, "collection is empty; ingest first"

    pairs = pairs_from_engine(engine)
    print(f"harvested {len(pairs)} pairs from {engine.index.size} rows")

    enc_cfg = EncoderConfig(
        vocab_size=30522, hidden_dim=256, num_layers=4, num_heads=8,
        mlp_dim=1024, max_len=256,
    )
    model = TextEncoder(enc_cfg)
    tok = HashTokenizer(vocab_size=enc_cfg.vocab_size)
    tcfg = TrainConfig(learning_rate=1e-4, warmup_steps=min(50, steps // 4))
    state = create_train_state(model, jax.random.PRNGKey(0), tcfg)
    step = make_train_step(model, tcfg)

    done = 0
    while done < steps:
        for batch in pairs_to_batches(pairs, tok, batch_size=32, max_len=128):
            import jax.numpy as jnp

            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            done += 1
            if done % 20 == 0:
                print(f"step {done}: loss={float(metrics['loss']):.4f} "
                      f"acc={float(metrics['accuracy']):.3f}")
            if done >= steps:
                break

    save_params(state.params, out, enc_cfg)
    print(f"saved checkpoint to {out}.npz")
    print("use it via collection config: "
          '{"embedding": {"provider": "onboard", "model": "%s"}}' % out)


if __name__ == "__main__":
    main()
