"""Embedding backends (SURVEY.md M1).

The reference embeds entity text with SentenceTransformer('all-MiniLM-L6-v2')
(parameter.py:29-37, llm.py:58-64). This sandbox has no model weights, so the
seam ships two interchangeable backends with one contract —
``embed(texts) -> list[list[float]]`` (unit-norm vectors):

- ``HashEmbedBackend`` — deterministic signed feature hashing (offline
  default; identical function drives the VDB and the query vector, so cosine
  ranking is meaningful and test-stable).
- ``SentenceTransformerBackend`` — the production backend. Lazy import gated
  on the library; the model is rebuilt per python worker on unpickle (model
  weights never ride the closure).
"""

from __future__ import annotations


class HashEmbedBackend:
    """Signed feature-hash embeddings (the round-1 seam, now backend-shaped)."""

    def __init__(self, dim: int | None = None):
        from mmgraphrag_spark.schema import EMBED_DIM

        self.dim = dim or EMBED_DIM

    def embed(self, texts) -> list:
        from mmgraphrag_spark.query import hash_embed_text

        return [hash_embed_text(t, self.dim) for t in texts]


class SentenceTransformerBackend:
    """Real sentence embeddings (reference all-MiniLM-L6-v2).

    Raises ImportError at construction when sentence_transformers is not
    installed — callers fall back to HashEmbedBackend; the Spark plumbing
    (Arrow batches through build_entity_vdb) is identical either way."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2"):
        from sentence_transformers import SentenceTransformer  # gated import

        self._model_name = model_name
        self._model = SentenceTransformer(model_name)

    def __getstate__(self):
        return {"model_name": self._model_name}

    def __setstate__(self, state):
        self.__init__(state["model_name"])

    def embed(self, texts) -> list:
        return self._model.encode(
            list(texts), normalize_embeddings=True, show_progress_bar=False
        ).tolist()


def default_embed_backend():
    """SentenceTransformerBackend when available, HashEmbedBackend otherwise."""
    try:
        return SentenceTransformerBackend()
    except ImportError:
        return HashEmbedBackend()
