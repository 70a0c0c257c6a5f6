#!/usr/bin/env python
"""Build the committed real-weights test fixture (VERDICT round-1 item #6).

Produces tests/fixtures/weights/<model>/{model.safetensors, tokenizer.json}
for the five tiny models (qwen LLM, bert embedder, reranker, sentiment,
toxicity) with:
  - a REAL BPE tokenizer (vocab 512, trained here with the `tokenizers`
    library on a deterministic synthetic-English corpus — no egress, yet
    real merges and real-word decodes; specials: <pad>=0, <unk>,
    <|im_start|>, <|im_end|>),
  - seeded HF-format torch weights saved via safetensors so both our JAX
    loaders and transformers load the SAME parameters (the token-identity
    tests compare our decode against transformers.generate on this fixture).

Deterministic: fixed torch/np seeds; re-running reproduces byte-identical
weights (tokenizer.json stable given the fixed corpus).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import transformers  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "weights"
)

TOPICS = [
    "climate", "medicine", "finance", "space", "history", "sports",
    "music", "cooking", "travel", "physics", "biology", "law",
]
WORDS = [
    "analysis", "report", "study", "overview", "data", "results", "method",
    "review", "survey", "facts", "notes", "summary", "the", "a", "is",
    "about", "what", "which", "document", "reference", "item", "question",
    "answer", "context", "use", "provided", "helpful", "assistant", "system",
    "user", "tell", "me",
]


def build_corpus() -> list[str]:
    rng = np.random.default_rng(7)
    lines = []
    for i in range(400):
        t = TOPICS[i % len(TOPICS)]
        ws = rng.choice(WORDS, size=24)
        lines.append(
            f"A {t} document. " + " ".join(ws) + f" Reference item {i}."
        )
        lines.append(f"{t.title()} document {i}")
    lines.append(
        "<|im_start|>system You are a helpful assistant. Use the provided "
        "context to answer the question.<|im_end|> <|im_start|>user "
        "Context: Question: what is this document about?<|im_end|> "
        "<|im_start|>assistant"
    )
    lines += [f"what is {t} about?" for t in TOPICS]
    return lines


def train_tokenizer(path: str) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<pad>", "<unk>", "<|im_start|>", "<|im_end|>"],
        show_progress=False,
    )
    tok.train_from_iterator(build_corpus(), trainer)
    assert tok.token_to_id("<pad>") == 0
    assert tok.token_to_id("<|im_end|>") is not None
    tok.save(path)


def state_clone(model) -> dict:
    return {k: v.clone().contiguous() for k, v in model.state_dict().items()}


def save_model(name: str, model, tokenizer_src: str) -> None:
    d = os.path.join(OUT, name)  # no "/" in tiny names -> dir == name
    os.makedirs(d, exist_ok=True)
    save_file(state_clone(model), os.path.join(d, "model.safetensors"))
    import shutil

    shutil.copy(tokenizer_src, os.path.join(d, "tokenizer.json"))
    sz = os.path.getsize(os.path.join(d, "model.safetensors"))
    print(f"{name}: {sz / 1e6:.2f} MB")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    tok_path = os.path.join(OUT, "tokenizer.json")
    train_tokenizer(tok_path)

    # qwen tiny — must match QwenConfig.tiny() exactly (models/qwen.py:54)
    qcfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=256, rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    torch.manual_seed(1234)
    save_model("tiny-qwen", transformers.Qwen2ForCausalLM(qcfg).eval(), tok_path)

    # bert tiny family — must match BertConfig.tiny() (models/bert.py:72)
    def bcfg(num_labels=0):
        return transformers.BertConfig(
            vocab_size=1024, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=128, type_vocab_size=2,
            hidden_act="gelu", attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, num_labels=num_labels,
        )

    torch.manual_seed(100)
    save_model("tiny-bert", transformers.BertModel(bcfg()).eval(), tok_path)
    torch.manual_seed(101)
    save_model(
        "tiny-rerank",
        transformers.BertForSequenceClassification(bcfg(1)).eval(), tok_path,
    )
    torch.manual_seed(102)
    save_model(
        "tiny-sent",
        transformers.BertForSequenceClassification(bcfg(5)).eval(), tok_path,
    )
    torch.manual_seed(103)
    save_model(
        "tiny-tox",
        transformers.BertForSequenceClassification(bcfg(6)).eval(), tok_path,
    )
    print("fixture written to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
