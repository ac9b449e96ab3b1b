"""Tokenizer backends for token-denominated operators (SURVEY.md P9).

The reference denominates chunk windows (preprocessing.py:30-69: 1200/100
TOKENS), the A3 summarize threshold (text2graph.py:97: 500 tokens) and A10
context budgets (base.py:215-245) in tiktoken tokens. This module provides:

- ``TiktokenBackend`` — the production backend. Imports tiktoken lazily; the
  encoding object is constructed once per python worker (it is cheap to build
  and caches its BPE ranks process-wide, which is the "broadcast the encoding"
  pattern — shipping the ranks via Spark broadcast would duplicate what
  tiktoken already memoizes per process).
- ``RegexTokenizerBackend`` — deterministic offline stand-in with the same
  encode/decode contract. Tokens are ``optional-leading-whitespace + (letter
  run | digit run | single symbol)`` so that ``decode(encode(s)) == s``
  exactly (every character belongs to exactly one token), mirroring how
  tiktoken attaches leading whitespace to word tokens. The SAME regex runs
  JVM-side in ``operators.spans.chunk_text_spans_bpe`` — the pytest parity
  suite asserts the python path and the JVM path produce identical chunks,
  which is what makes the pandas-UDF plumbing trustworthy before a real
  tiktoken is dropped in.

A backend implements ``encode(text) -> list`` and ``decode(tokens) -> str``;
``count(text)`` defaults to ``len(encode(text))``.
"""

from __future__ import annotations

import re

# one token = optional leading whitespace + an atom; identical semantics in
# python re, Java regex (Spark) and RE2 (DuckDB) — [0-9] not \d on purpose,
# and the python side compiles with re.ASCII because Java regex and RE2 treat
# \s as ASCII-only while python re defaults to Unicode (U+00A0 etc. would
# otherwise tokenize differently across engines)
TOKEN_PATTERN = r"\s*(?:[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"


class RegexTokenizerBackend:
    """Deterministic BPE-ish tokenizer with exact decode round-trip."""

    def __init__(self) -> None:
        self._re = re.compile(TOKEN_PATTERN, re.ASCII)

    def encode(self, text: str) -> list:
        text = text or ""
        toks = self._re.findall(text)
        # the pattern consumes a contiguous prefix ending at the last atom;
        # TRAILING whitespace belongs to no token — restore it as a final
        # token so decode(encode(x)) == x holds for every input
        consumed = sum(len(t) for t in toks)
        if consumed < len(text):
            toks.append(text[consumed:])
        return toks

    def decode(self, tokens: list) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        return len(self.encode(text))


class TiktokenBackend:
    """tiktoken-faithful tokenization (reference base.py:120-134).

    Raises ImportError at construction when tiktoken is not installed (this
    sandbox ships without it) — callers catch and fall back to
    ``RegexTokenizerBackend``; the Spark plumbing is identical either way.
    """

    def __init__(self, model_name: str = "gpt-4o"):
        import tiktoken  # ImportError here gates the fallback

        self._model_name = model_name
        self._enc = tiktoken.encoding_for_model(model_name)

    def __getstate__(self):
        # the Encoding object holds regex/rank caches that may not pickle;
        # rebuild per worker from the model name instead
        return {"model_name": self._model_name}

    def __setstate__(self, state):
        self.__init__(state["model_name"])

    def encode(self, text: str) -> list:
        return self._enc.encode(text or "")

    def decode(self, tokens: list) -> str:
        return self._enc.decode(list(tokens))

    def count(self, text: str) -> int:
        return len(self.encode(text))


def default_backend():
    """TiktokenBackend when available, RegexTokenizerBackend otherwise."""
    try:
        return TiktokenBackend()
    except ImportError:
        return RegexTokenizerBackend()
