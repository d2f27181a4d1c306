"""Streaming surface.

The reference is strictly batch (``SegmentImage::update`` recomputes from a
full image, /root/reference/src/SegmentImageImpl.cpp:27-31 — no incremental
path), so the engine's core is batch too. This package holds the
Structured-Streaming ingest adapter used for continuously arriving event
data (see ``events.py``); iterative graph state lives in
``imtag_spark.plans.checkpoint`` (parquet superstep checkpoints), not in
Structured Streaming state stores.
"""
