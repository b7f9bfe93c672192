"""LLM-data-pipeline specs — dedup, similarity search, text analysis over
``documents``/``embeddings`` (filled by operators/{dedup,similarity,text}.py)."""

from __future__ import annotations
