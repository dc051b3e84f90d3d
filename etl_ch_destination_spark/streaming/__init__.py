"""Structured Streaming layer (SURVEY §2.9).

The reference's own shape is stream → transform → batched insert into
ClickHouse (SURVEY §3.3). Design rule here: every windowed/sessionized
transformation is written ONCE as a plain DataFrame function
(pipeline.py) that works identically on a batch frame and a streaming
frame — the batch form is what the DuckDB oracle checks, the
streaming form is replay-tested in tests/test_streaming.py
(stream-vs-batch equivalence, SURVEY §5.3)."""
