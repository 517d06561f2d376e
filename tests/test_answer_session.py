"""AnswerSession state-machine parity (methods/answer-session.ts):
message layout, interaction state transitions, abort, regenerate-last
guard, missing-transport error. The LLM transport is a deterministic
fake — the reference's own transport is a hosted service."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.query.answer_session import AnswerSession, AnswerSessionError
from orama_spark.query.engine import SearchIndex

ROWS = [
    (1, "spark streaming joins"),
    (2, "spark shuffle service"),
    (3, "columnar parquet scans"),
]


@pytest.fixture(scope="module")
def idx(spark):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="orama_spark_ans_")
    cfg = IndexConfig(schema={"t": "string"})
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS, "docid long, t string"), d, input_id="ans"
    )
    yield SearchIndex.load(spark, d, cfg)
    shutil.rmtree(d, ignore_errors=True)


def echo_llm(messages):
    # deterministic fake: stream the last user turn back in 2 chunks
    last_user = [m for m in messages if m["role"] == "user"][-1]["content"]
    yield f"about:{last_user}"
    yield "!"


def test_ask_accumulates_and_tracks_state(idx):
    states_seen = []
    s = AnswerSession(
        idx, chat_stream=echo_llm, system_prompt="be brief",
        on_state_change=lambda st: states_seen.append(len(st)),
    )
    out = s.ask(term="spark")
    assert out == "about:spark!"
    # message layout: system first, then user, then assistant holding
    # the full streamed content
    assert [m["role"] for m in s.messages] == ["system", "user", "assistant"]
    assert s.messages[-1]["content"] == "about:spark!"
    inter = s.state[-1]
    assert inter.query == "spark" and inter.response == "about:spark!"
    assert inter.loading is False and not inter.error and not inter.aborted
    # sources is the LAZY search result; collecting it yields hits
    assert inter.sources.top_df().count() == 2
    assert states_seen  # observer fired


def test_regenerate_last_guard_and_replay(idx):
    s = AnswerSession(idx, chat_stream=echo_llm)
    with pytest.raises(AnswerSessionError, match="No messages"):
        s.regenerate_last()
    s.ask(term="parquet")
    assert len(s.state) == 1
    out = "".join(s.regenerate_last(stream=True))
    assert out == "about:parquet!"
    assert len(s.state) == 1  # popped then re-added
    # guard: last message must be the assistant turn
    s.messages.append({"role": "user", "content": "dangling"})
    with pytest.raises(AnswerSessionError, match="NOT_ASSISTANT"):
        s.regenerate_last()


def test_abort_mid_stream(idx):
    s = AnswerSession(idx, chat_stream=echo_llm)
    gen = s.ask_stream(term="spark")
    first = next(gen)
    assert first == "about:spark"
    s.abort_answer()
    rest = list(gen)
    assert rest == []
    inter = s.state[-1]
    assert inter.aborted is True and inter.loading is False
    assert inter.response == "about:spark"  # chunks before the abort kept


def test_transport_errors(idx):
    with pytest.raises(AnswerSessionError, match="SECURE_PROXY_NOT_FOUND"):
        AnswerSession(idx).ask_stream(term="x")

    def boom(_messages):
        raise RuntimeError("llm down")
        yield  # pragma: no cover

    s = AnswerSession(idx, chat_stream=boom)
    assert s.ask(term="x") == ""
    inter = s.state[-1]
    assert inter.error and "llm down" in inter.error_message
    assert inter.loading is False


def test_clear_session(idx):
    s = AnswerSession(idx, chat_stream=echo_llm, initial_messages=[
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ])
    s.ask(term="spark")
    s.clear_session()
    assert s.messages == [] and s.state == []
