"""rag_inference_pipeline_tpu — a TPU-native distributed RAG inference framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
IanHollow/rag-inference-pipeline (see /root/repo/SURVEY.md): a 3-stage RAG
pipeline (retrieval -> generation -> post-processing) with relocatable stages,
adaptive opportunistic batching, an HBM-resident ANN index engine (exact
flat-IP, IVF-Flat, IVF-PQ with on-TPU k-means / PQ training), JAX transformer
models (embedder, cross-encoder reranker, causal LM with continuous batching,
classifiers), an aiohttp serving surface with the reference's endpoint and
schema semantics, Prometheus/OTel telemetry, and an experiment harness.

The compute path is JAX on a `jax.sharding.Mesh` (dp x tp axes); the host-side
runtime (document store, compression) has native C++ components under
`native/`.
"""

__version__ = "0.1.0"
