"""Gates for the round-4 corpus-statistics operators
(queries/llm_corpus.py): Counter-reference equality for word rarity,
priority-survivorship for cross-source dedup, the quantization error
bound, and bucket-partition invariants for length buckets."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, n_chars int, lang string, source string"


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir(exist_ok=True)
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_word_rarity_matches_counter_reference(spark, tmp_path):
    """Exact equality against a Python Counter reference on a corpus
    with a known vocabulary-frequency profile."""
    from etl_ch_destination_spark.queries.llm_corpus import llm_word_rarity

    texts = {
        1: "a a b common common common",
        2: "b rare common",
        3: "common",
        4: "x y z a",
    }
    rows = [(i, t, len(t), "en", "src") for i, t in texts.items()]
    sf = _write_docs(spark, tmp_path, rows)

    vocab = Counter(w for t in texts.values() for w in t.split(" "))
    got = {r.doc_id: r for r in llm_word_rarity(spark, sf).collect()}
    assert sorted(got) == sorted(texts)
    for doc_id, text in texts.items():
        words = text.split(" ")
        counts = [vocab[w] for w in words]
        r = got[doc_id]
        assert r.n_words == len(words)
        assert r.min_count == min(counts)
        assert r.sum_count == sum(counts)
        assert r.avg_count == sum(counts) / len(words)


def test_unigram_logprob_matches_bitlen_reference(spark, tmp_path):
    """Exact equality against a Python reference: whole-bit surprisal
    bits_w = bitlen(N // n_w) - 1 == floor(log2(N / n_w)), m-weighted
    per doc. Also checks the quantization identity on every (N, n)
    pair the corpus produces."""
    import math

    from etl_ch_destination_spark.queries.llm_corpus import llm_unigram_logprob

    texts = {
        1: "the the the cat",
        2: "the quick brown fox jumps",
        3: "zyx zyx qwerty",
        4: "the cat the cat",
    }
    rows = [(i, t, len(t), "en", "src") for i, t in texts.items()]
    sf = _write_docs(spark, tmp_path, rows)

    vocab = Counter(w for t in texts.values() for w in t.split(" "))
    N = sum(vocab.values())
    bits = {w: (N // n).bit_length() - 1 for w, n in vocab.items()}
    for w, n in vocab.items():  # quantization identity
        assert bits[w] == math.floor(math.log2(N / n))

    got = {r.doc_id: r for r in llm_unigram_logprob(spark, sf).collect()}
    assert sorted(got) == sorted(texts)
    for doc_id, text in texts.items():
        words = text.split(" ")
        want_bits = sum(bits[w] for w in words)
        r = got[doc_id]
        assert r.n_words == len(words)
        assert r.sum_bits == want_bits
        assert r.bits_per_word == want_bits / len(words)
    # ordering sanity: the all-stopword doc is cheaper than the rare one
    assert got[4].bits_per_word < got[3].bits_per_word


def test_cross_dedup_keeps_priority_source(spark, tmp_path):
    """Planted cross-source duplicates: the survivor is always the
    lexicographically-first source (doc_id tiebreak), and the shadow
    counts account for every copy."""
    from etl_ch_destination_spark.queries.llm_corpus import llm_cross_dedup

    rows = [
        # same text from three sources -> survivor = (curated, 10)
        (12, "the shared text", 15, "en", "web"),
        (10, "the shared text", 15, "en", "curated"),
        (11, "The Shared TEXT  ", 15, "en", "forum"),  # normalizes equal? no — spaces differ
        (13, "the shared text", 15, "en", "curated"),  # tie on source -> doc_id wins
        # unique text -> survives trivially
        (20, "a unique document", 17, "en", "web"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.doc_id: r for r in llm_cross_dedup(spark, sf).collect()}

    # "The Shared TEXT  " lower+trims to "the shared text  "? No:
    # trim strips outer spaces -> "the shared text" — it IS a dupe.
    assert set(got) == {10, 20}
    assert got[10].source == "curated"
    assert got[10].n_copies == 4
    assert got[10].n_sources == 3
    assert got[20].n_copies == 1 and got[20].n_sources == 1
    # survivors are unique per content hash
    hashes = [r.content_hash for r in got.values()]
    assert len(hashes) == len(set(hashes))


def test_embedding_quantize_error_bound(spark, sf_dir):
    """Per-vector reconstruction error is bounded by the quantizer's
    half-step: sq_err <= dim * (scale/2)^2 (floor(x+0.5) rounds to the
    nearest level, clamp never binds at |x| <= absmax)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import llm_embedding_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    rows = llm_embedding_quantize(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.scale > 0
        assert r.sq_err <= dim * (r.scale / 2.0) ** 2 * (1 + 1e-12)
        assert r.q_l1 >= abs(r.q_sum)
        assert r.q_l1 <= dim * 127


def test_eval_split_is_stable_and_partitions_corpus(spark, sf_dir, tmp_path):
    """Split fractions sum to 1 per source, counts cover the corpus,
    and — the property that matters — assignment is a pure function of
    doc_id: adding documents never reassigns existing ones."""
    import hashlib

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import (
        SPLIT_DENOM,
        SPLIT_TRAIN,
        SPLIT_VALID,
        llm_eval_split,
    )

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    rows = llm_eval_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        assert abs(sum(r.frac for r in rs) - 1.0) < 1e-12
        # 80/10/10 targets within a generous tolerance at fixture scale
        fr = {r.split: r.frac for r in rs}
        assert fr.get("train", 0) > 0.6
    # python replay of the md5 threshold == operator's implied assignment
    def py_split(doc_id: int) -> str:
        u = int(hashlib.md5(f"{doc_id}:split1".encode()).hexdigest()[:7], 16)
        u /= SPLIT_DENOM
        return "train" if u < SPLIT_TRAIN else ("valid" if u < SPLIT_VALID else "test")

    ids = list(range(200))
    synth = _write_docs(
        spark, tmp_path, [(i, f"doc {i}", 6, "en", "s") for i in ids]
    )
    want = Counter(py_split(i) for i in ids)
    got = {r.split: r.n_docs for r in llm_eval_split(spark, synth).collect()}
    assert got == dict(want)
    # determinism across reruns (same session, fresh plan)
    again = {(r.source, r.split): r.n_docs for r in llm_eval_split(spark, sf_dir).collect()}
    assert again == {(r.source, r.split): r.n_docs for r in rows}


def test_training_mixture_funnel_invariants(spark, sf_dir, tmp_path):
    """Funnel stages are monotone and internally consistent: raw >=
    dedup >= quality = train+valid+test per source; on a planted
    corpus the dedup and quality stages drop exactly the planted
    rows."""
    from etl_ch_destination_spark.queries.llm_corpus import rpt_training_mixture

    rows = rpt_training_mixture(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_dedup >= r.n_quality >= 0
        assert r.n_quality == r.n_train + r.n_valid + r.n_test
        assert r.train_words >= r.n_train * 50  # every kept doc has >= 50 words

    # planted: 3 copies of one good doc (1 survives), 1 short doc
    # (killed by quality), 1 distinct good doc
    good = " ".join(f"w{i}" for i in range(60))
    good2 = " ".join(f"v{i}" for i in range(60))
    rows_in = [
        (1, good, len(good), "en", "s"),
        (2, good, len(good), "en", "s"),
        (3, good, len(good), "en", "s"),
        (4, "too short", 9, "en", "s"),
        (5, good2, len(good2), "en", "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows_in)
    r = rpt_training_mixture(spark, sf).collect()
    assert len(r) == 1 and r[0].source == "s"
    assert r[0].n_raw == 5
    assert r[0].n_dedup == 3   # dupes of `good` collapse to doc 1
    assert r[0].n_quality == 2  # short doc dropped


def test_length_buckets_partition_docs(spark, sf_dir):
    """Buckets partition the corpus: per-lang doc counts sum to the
    corpus count, and every bucket's min/max stay inside its bounds."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import (
        BUCKET_WIDTH,
        llm_length_buckets,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_docs = d.count()
    rows = llm_length_buckets(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket_lo == r.bucket * BUCKET_WIDTH
        assert r.bucket_lo <= r.min_words <= r.max_words < r.bucket_lo + BUCKET_WIDTH
        assert r.min_words * r.n_docs <= r.total_words <= r.max_words * r.n_docs
    # (lang, bucket) keys are unique
    keys = [(r.lang, r.bucket) for r in rows]
    assert len(keys) == len(set(keys))


def test_line_dedup_keeps_first_occurrence(spark, tmp_path):
    """Hand-checked corpus: a 10-word block shared by two docs survives
    only in the earlier doc; the later doc reassembles without it."""
    import hashlib

    from etl_ch_destination_spark.queries.llm_corpus import LINE_W, llm_line_dedup

    shared = " ".join(f"s{i}" for i in range(LINE_W))
    a_tail = " ".join(f"a{i}" for i in range(LINE_W))
    b_tail = " ".join(f"b{i}" for i in range(7))  # partial last block
    doc_a = f"{shared} {a_tail}"
    doc_b = f"{shared} {b_tail}"
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, doc_a, len(doc_a), "en", "s"), (2, doc_b, len(doc_b), "en", "s")],
    )
    got = {r.doc_id: r for r in llm_line_dedup(spark, sf).collect()}
    assert got[1].n_blocks == 2 and got[1].n_kept == 2
    assert got[2].n_blocks == 2 and got[2].n_kept == 1  # shared block dropped
    assert got[1].kept_md5 == hashlib.md5(doc_a.encode()).hexdigest()
    assert got[2].kept_md5 == hashlib.md5(b_tail.encode()).hexdigest()


def test_line_dedup_is_identity_on_unique_corpus(spark, tmp_path):
    """With no repeated blocks, every doc reassembles to itself."""
    import hashlib

    from etl_ch_destination_spark.queries.llm_corpus import llm_line_dedup

    docs = {
        i: " ".join(f"w{i}_{j}" for j in range(25)) for i in range(1, 5)
    }
    sf = _write_docs(
        spark, tmp_path, [(i, t, len(t), "en", "s") for i, t in docs.items()]
    )
    got = {r.doc_id: r for r in llm_line_dedup(spark, sf).collect()}
    for i, t in docs.items():
        assert got[i].n_blocks == got[i].n_kept == 3  # 25 words -> 10+10+5
        assert got[i].kept_md5 == hashlib.md5(t.encode()).hexdigest()


def test_corpus_curate_job_roundtrip(spark, sf_dir, tmp_path):
    """The curation job writes a split-partitioned corpus whose re-read
    report matches the job's own return value, every written doc
    passes the quality gate, and a re-run is idempotent."""
    from etl_ch_destination_spark.jobs.curate_corpus import run_curate_corpus
    from etl_ch_destination_spark.queries.llm_corpus import TM_MIN_WORDS

    out = str(tmp_path / "curated")
    rep1 = {(r.split, r.source): (r.n_docs, r.total_words, r.n_batches)
            for r in run_curate_corpus(spark, sf_dir, out).collect()}
    assert rep1 and all(nb == 1 for (_, _, nb) in rep1.values())

    loaded = spark.read.parquet(out)
    assert set(loaded.select("split").distinct().toPandas()["split"]) <= {
        "train", "valid", "test"
    }
    # every written doc passes the length gate and is unique
    assert loaded.filter(F.col("n_words") < TM_MIN_WORDS).count() == 0
    assert loaded.select("doc_id").distinct().count() == loaded.count()

    rep2 = {(r.split, r.source): (r.n_docs, r.total_words, r.n_batches)
            for r in run_curate_corpus(spark, sf_dir, out).collect()}
    assert rep2 == rep1


def test_bigram_lm_matches_counter_reference(spark, tmp_path):
    """Counts, head totals, ranks, and probabilities equal a Counter
    reference on a corpus with known bigram structure."""
    from etl_ch_destination_spark.queries.llm_corpus import (
        BIGRAM_TOPK,
        llm_bigram_lm,
    )

    texts = {
        1: "a b a b a c",
        2: "a b x",
        3: "c a b",
        4: "solo",  # < 2 words -> contributes nothing
    }
    sf = _write_docs(
        spark, tmp_path, [(i, t, len(t), "en", "s") for i, t in texts.items()]
    )
    bigrams = Counter()
    for t in texts.values():
        ws = t.split(" ")
        bigrams.update(zip(ws, ws[1:]))
    heads = Counter()
    for (w1, _), n in bigrams.items():
        heads[w1] += n

    rows = llm_bigram_lm(spark, sf).collect()
    for r in rows:
        assert r.n == bigrams[(r.w1, r.w2)]
        assert r.head_n == heads[r.w1]
        assert r.cond_prob == r.n / r.head_n
        assert 1 <= r.rank <= BIGRAM_TOPK
    # per head: top successors by (count desc, word asc)
    by_head: dict = {}
    for r in rows:
        by_head.setdefault(r.w1, {})[r.rank] = r.w2
    for w1, d in by_head.items():
        succ = sorted(
            ((w2, n) for (h, w2), n in bigrams.items() if h == w1),
            key=lambda t: (-t[1], t[0]),
        )[:BIGRAM_TOPK]
        assert [d[i] for i in sorted(d)] == [w for w, _ in succ]
    assert "solo" not in by_head
    # p(b|a) dominates: "a b" occurs 4 times of 5 a-heads
    a_rows = {r.w2: r for r in rows if r.w1 == "a"}
    assert a_rows["b"].rank == 1 and a_rows["b"].cond_prob == 4 / 5


def test_bpe_learn_matches_exact_python_replay(spark, sf_dir):
    """llm_bpe_learn vs an independent single-process replay of the
    algorithm (freq-weighted pair counts over the word vocabulary,
    argmax with count-desc-then-lexicographic tie-break, greedy
    non-overlapping left-to-right merge application): the whole merge
    table must match EXACTLY — rank for rank, pair for pair, count for
    count. Stronger than a hash oracle for this operator."""
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import (
        BPE_MERGES,
        llm_bpe_learn,
    )

    got = [tuple(r) for r in llm_bpe_learn(spark, sf_dir).collect()]

    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    wc: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    vocab: dict = {}
    for w, f in wc.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + f

    def apply_merge(syms, left, right):
        out: list = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return tuple(out)

    expect = []
    for rank in range(BPE_MERGES):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rank, left, right, left + right, cnt))
        nxt: dict = {}
        for syms, f in vocab.items():
            ns = apply_merge(syms, left, right)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt

    assert len(got) == len(expect) == BPE_MERGES
    assert got == expect


def test_bpe_encode_matches_python_train_and_encode(spark, sf_dir):
    """llm_bpe_encode per-doc token counts vs a full Python replay of
    train+encode: the learned dictionary applied word-by-word must
    yield EXACTLY the same n_bpe_tokens for every document."""
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import (
        BPE_MERGES,
        llm_bpe_encode,
    )

    got = {r.doc_id: r for r in llm_bpe_encode(spark, sf_dir).collect()}

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    wc: Counter = Counter()
    for t in docs.values():
        for w in t.split(" "):
            if w:
                wc[w] += 1
    vocab = {tuple(w): f for w, f in wc.items()}

    def apply_merge(syms, left, right):
        out: list = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return tuple(out)

    merges = []
    for _ in range(BPE_MERGES):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (left, right), _cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right))
        nxt: dict = {}
        for syms, f in vocab.items():
            ns = apply_merge(syms, left, right)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt

    def encode_word(w):
        syms = tuple(w)
        for left, right in merges:
            syms = apply_merge(syms, left, right)
        return len(syms)

    tok_cache: dict = {}
    for doc_id, text in docs.items():
        words = [w for w in text.split(" ") if w]
        if not words:
            assert doc_id not in got  # inner join drops word-less docs
            continue
        n_tok = 0
        for w in words:
            if w not in tok_cache:
                tok_cache[w] = encode_word(w)
            n_tok += tok_cache[w]
        r = got[doc_id]
        assert (r.n_words, r.n_bpe_tokens) == (len(words), n_tok), doc_id
        assert r.n_chars == len(text)
