"""Structured Streaming layer (SURVEY §2.9 T1–T12).

The reference is a pure-streaming warehouse (Flink DataStream/SQL);
this package holds the Structured Streaming twins of the batch plans:
watermarked tumbling windows, stateful per-key operators
(applyInPandasWithState), and the sink family (append / upsert /
multi-output split / dynamic routing). Batch plans in `plans/` remain
the oracle-checked source of truth; streaming twins are verified
against them via availableNow replays (tests/test_streaming.py).
"""
