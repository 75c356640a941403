"""Transcripts source — the engine's only document source.

Replaces the reference's recursive web crawl
(``/root/reference/src/main/java/searchengine/services/indexation/WebScraper.java:43-94``)
per BASELINE.json's ``input_hint``: the corpus is a closed Parquet table
of transcript turns, read with ``ray.data.read_parquet`` with column
pruning (only the columns a stage needs leave storage).
"""

from __future__ import annotations

import ray.data


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
ANALYSIS_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def read_transcripts(paths: list[str] | str, columns: list[str] | None = None,
                     **read_kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=columns or TRANSCRIPT_COLUMNS, **read_kwargs)
