from .bert import (
    BertConfig,
    bert_classify,
    bert_embed,
    bert_encode,
    init_bert_params,
)
from .components import (
    EmbedderComponent,
    LLMComponent,
    RerankerComponent,
    SentimentComponent,
    ToxicityComponent,
)
from .qwen import (
    QwenConfig,
    greedy_generate,
    ngram_speculative_generate,
    init_qwen_params,
    qwen_decode_step,
    qwen_forward,
    qwen_extend,
    qwen_prefill,
)
from .tokenizer import HashTokenizer, HFTokenizer, make_tokenizer

__all__ = [
    "BertConfig",
    "bert_classify",
    "bert_embed",
    "bert_encode",
    "init_bert_params",
    "EmbedderComponent",
    "LLMComponent",
    "RerankerComponent",
    "SentimentComponent",
    "ToxicityComponent",
    "QwenConfig",
    "greedy_generate",
    "ngram_speculative_generate",
    "init_qwen_params",
    "qwen_decode_step",
    "qwen_forward",
    "qwen_extend",
    "qwen_prefill",
    "HashTokenizer",
    "HFTokenizer",
    "make_tokenizer",
]
