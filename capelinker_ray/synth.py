"""Deterministic synthetic transcript corpus generator (FIXTURES.md F1).

Produces the engine's primary input — a Parquet-shaped Arrow table of
multi-turn conversation transcripts
(``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``) — plus a ground-truth table ``(conv_id, entity_id)``.

Entity model mirrors the reference's panel structure: each "entity" (analog
of a household appearing across opgaafrollen years,
/root/reference/data_raw/traindata_graafreinet.R:176-180) is emitted 1..4
times as near-duplicate conversations. Duplicates are corrupted per the noise
the reference handles: frequency-weighted character typos (rand_strings_like,
/root/reference/R/util.R:217-229), diacritic insertion (rm_diacretics cases,
util.R:203-208), case flips / stray whitespace / empty-vs-null text
(preflight checks, /root/reference/R/prep.R:121-166), dropped or extra
late turns, tool renames, and timestamp jitter. A Zipf head of shared
first-turn openers (~2% of entities) creates hot blocking keys to exercise
salted-block splitting.

Everything is seeded (numpy default_rng); no wall-clock reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

TRUTH_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("entity_id", pa.int64()),
])

_TOOLS = ["search", "exec", "browse", "calc", "lookup", "fetch"]
_TOOL_RENAMES = {"search": "websearch", "exec": "shell", "browse": "browser",
                 "calc": "calculator", "lookup": "kb_lookup", "fetch": "http_fetch"}
_HOT_OPENERS = [
    "how do i fix the error in",
    "what is the best way to",
    "please help me understand the",
    "can you explain why the",
    "write a short summary of",
]
_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00 UTC in microseconds


def _make_vocab(rng: np.random.Generator, n_words: int = 240) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    freq = np.array([8.2, 1.5, 2.8, 4.3, 12.7, 2.2, 2.0, 6.1, 7.0, 0.15, 0.77,
                     4.0, 2.4, 6.7, 7.5, 1.9, 0.1, 6.0, 6.3, 9.1, 2.8, 1.0,
                     2.4, 0.15, 2.0, 0.07])
    freq = freq / freq.sum()
    vocab = []
    seen = set()
    while len(vocab) < n_words:
        k = int(rng.integers(3, 9))
        w = "".join(rng.choice(letters, size=k, p=freq))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _sentence(rng: np.random.Generator, vocab: list[str], zipf_p: np.ndarray,
              n_lo: int, n_hi: int) -> str:
    n = int(rng.integers(n_lo, n_hi + 1))
    idx = rng.choice(len(vocab), size=n, p=zipf_p)
    return " ".join(vocab[i] for i in idx)


def _typo(rng: np.random.Generator, s: str, rate: float) -> str:
    """Frequency-weighted char corruption: substitute / delete / swap."""
    if not s:
        return s
    chars = list(s)
    n_err = rng.binomial(max(len(chars) - 1, 1), rate)
    for _ in range(n_err):
        i = int(rng.integers(0, len(chars)))
        op = rng.random()
        if op < 0.5:
            chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
        elif op < 0.75 and len(chars) > 1:
            del chars[i]
        elif i + 1 < len(chars):
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


_DIACRITIC_SUB = {"e": "é", "a": "à", "u": "ü", "i": "ï", "c": "ç"}


def _corrupt_text(rng: np.random.Generator, s: str, protect_prefix: int = 0,
                  typo_rate: float = 0.04) -> str:
    """Corrupt a turn text, optionally keeping the first N chars intact
    (blocking-key-preserving corruption for most duplicates)."""
    head, tail = s[:protect_prefix], s[protect_prefix:]
    tail = _typo(rng, tail, typo_rate)
    if rng.random() < 0.15:  # diacritic insertion
        for src, dst in _DIACRITIC_SUB.items():
            if src in tail and rng.random() < 0.5:
                tail = tail.replace(src, dst, 1)
    if rng.random() < 0.1:  # stray whitespace
        tail = tail.replace(" ", "  ", 1)
    if rng.random() < 0.08:  # case flip of one word
        words = tail.split(" ")
        if words:
            j = int(rng.integers(0, len(words)))
            words[j] = words[j].upper()
            tail = " ".join(words)
    return head + tail


def gen_corpus(n_entities: int = 300, seed: int = 42,
               hot_frac: float = 0.02, id_offset: int = 0,
               scope: str = ""):
    """Generate (turns: pa.Table, truth: pa.Table).

    ``id_offset`` lets shards of a large corpus be generated independently
    (entity ids and conv ids are globally unique per offset range).

    ``scope`` (optional) prefixes every hot opener, making hot blocking
    keys scoped to this shard. A sharded corpus models growth the way the
    web grows — more domains, each with its OWN boilerplate openers — so
    hot-block sizes stay bounded by shard size and total candidate-pair
    work stays proportional to corpus size. Without scoping, the 5 global
    openers form blocks that grow linearly with the corpus and pair work
    grows quadratically (measured: 93% of all pairs from 5 blocks at 1.2M
    entities), so a scaling benchmark stops measuring the engine.
    Globally-hot-key handling is exercised separately by the salting tests
    (tests/test_blocking.py) and the default unscoped single-shard corpus.
    """
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / (1.0 / ranks).sum()

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    t_conv, t_ent = [], []

    n_dup_probs = np.array([0.35, 0.30, 0.20, 0.15])
    conv_counter = 0
    for e in range(n_entities):
        ent_id = id_offset + e
        # base conversation
        if rng.random() < hot_frac:
            opener = _HOT_OPENERS[int(rng.integers(0, len(_HOT_OPENERS)))]
            if scope:
                opener = scope + " " + opener
            first = opener + " " + _sentence(rng, vocab, zipf_p, 2, 4)
        else:
            first = _sentence(rng, vocab, zipf_p, 4, 8)
        n_turns = int(rng.integers(3, 9))
        base_turns = []
        ts0 = _EPOCH_US + ent_id * 60_000_000 + int(rng.integers(0, 30_000_000))
        for t in range(n_turns):
            if t == 0:
                role, text, tool = "user", first, None
            else:
                role = "assistant" if t % 2 == 1 else "user"
                tool = None
                if role == "assistant" and rng.random() < 0.3:
                    role = "tool"
                    tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))]
                text = _sentence(rng, vocab, zipf_p, 3, 12)
                if rng.random() < 0.03:
                    text = "" if rng.random() < 0.5 else None  # NA semantics
            base_turns.append((role, text, tool, ts0 + t * 45_000_000))

        n_copies = 1 + int(rng.choice(4, p=n_dup_probs))
        for c in range(n_copies):
            cid = f"c{id_offset + conv_counter:09d}"
            conv_counter += 1
            t_conv.append(cid)
            t_ent.append(ent_id)
            turns = list(base_turns)
            if c > 0:
                # corrupted duplicate; ~90% preserve the 16-char blocking prefix
                protect = 16 if rng.random() < 0.9 else 0
                jitter = int(rng.integers(-5_000_000, 5_000_000))
                epoch_shift = (c) * 86_400_000_000  # later "round", like panel years
                new_turns = []
                for t, (role, text, tool, ts) in enumerate(turns):
                    if t >= 2 and rng.random() < 0.10:
                        continue  # dropped turn
                    if text is not None:
                        text = _corrupt_text(rng, text, protect if t == 0 else 0)
                    if tool is not None and rng.random() < 0.15:
                        tool = _TOOL_RENAMES.get(tool, tool)
                    new_turns.append((role, text, tool, ts + jitter + epoch_shift))
                if rng.random() < 0.10:  # extra trailing turn
                    new_turns.append(("assistant",
                                      _sentence(rng, vocab, zipf_p, 3, 8), None,
                                      new_turns[-1][3] + 45_000_000))
                turns = new_turns
            for idx, (role, text, tool, ts) in enumerate(turns):
                conv_ids.append(cid)
                turn_idxs.append(idx)
                roles.append(role)
                texts.append(text)
                tools.append(tool)
                tss.append(ts)

    turns_tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    truth_tbl = pa.table({
        "conv_id": pa.array(t_conv, pa.string()),
        "entity_id": pa.array(t_ent, pa.int64()),
    }, schema=TRUTH_SCHEMA)
    return turns_tbl, truth_tbl


def write_corpus(out_dir: str, n_entities: int = 300, seed: int = 42,
                 shards: int = 1, hot_frac: float = 0.02) -> tuple[str, str]:
    """Write a sharded corpus: ``<out_dir>/transcripts/shard=K/part.parquet``
    plus ``<out_dir>/truth.parquet``. Shards are generated independently
    (disjoint id ranges) — the layout a resumable 100-TB ingest would use.
    With ``shards > 1`` hot openers are shard-scoped (see ``gen_corpus``)
    so candidate-pair work grows linearly with corpus size."""
    import os
    import pyarrow.parquet as pq

    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    per = n_entities // shards
    jobs = []
    for k in range(shards):
        n_k = per + (n_entities % shards if k == shards - 1 else 0)
        jobs.append((tdir, k, n_k, seed + k, k * per * 8, hot_frac,
                     f"s{k}" if shards > 1 else ""))
    if shards > 4:
        # shards are independent by construction — generate them in
        # parallel processes (pure numpy gen, no Ray needed here)
        import multiprocessing as mp
        with mp.get_context("spawn").Pool(min(16, shards)) as pool:
            truth_paths = pool.map(_write_shard, jobs)
    else:
        truth_paths = [_write_shard(j) for j in jobs]
    truths = [pq.read_table(p) for p in truth_paths]
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(pa.concat_tables(truths), truth_path)
    for p in truth_paths:
        os.remove(p)
    return tdir, truth_path


def _write_shard(job: tuple) -> str:
    """Generate + write one shard (module-level for Pool picklability);
    returns the path of the shard's truth fragment."""
    import os
    import pyarrow.parquet as pq

    tdir, k, n_k, seed, id_offset, hot_frac, scope = job
    turns, truth = gen_corpus(n_k, seed=seed, id_offset=id_offset,
                              hot_frac=hot_frac, scope=scope)
    sdir = os.path.join(tdir, f"shard={k}")
    os.makedirs(sdir, exist_ok=True)
    pq.write_table(turns, os.path.join(sdir, "part.parquet"))
    tp = os.path.join(sdir, "_truth_frag.parquet")
    pq.write_table(truth, tp)
    return tp


def transcripts_from_documents(sf_dir: str, seed: int = 7):
    """Derive a deterministic transcript corpus from the driver's
    ``documents.parquet`` (TESTDATA.md): each document becomes one
    conversation (text split into sentence-ish turns); even doc_ids get one
    corrupted duplicate conversation. Ground truth entity = doc_id.

    Used by ``__ray_entry__.entry()`` so the flagship pipeline runs over the
    provided testdata while matching the transcript input_hint schema.
    """
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rng = np.random.default_rng(seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    t_conv, t_ent = [], []
    doc_ids = docs["doc_id"].to_pylist()
    doc_texts = docs["text"].to_pylist()
    for doc_id, text in zip(doc_ids, doc_texts):
        words = (text or "").split()
        chunks = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)][:6] or [""]
        copies = 2 if doc_id % 2 == 0 else 1
        for c in range(copies):
            cid = f"d{doc_id:07d}_{c}"
            t_conv.append(cid)
            t_ent.append(doc_id)
            ts0 = _EPOCH_US + doc_id * 60_000_000 + c * 86_400_000_000
            for idx, chunk in enumerate(chunks):
                txt = chunk
                if c > 0:
                    txt = _corrupt_text(rng, chunk, protect_prefix=16 if idx == 0 else 0)
                conv_ids.append(cid)
                turn_idxs.append(idx)
                roles.append("user" if idx % 2 == 0 else "assistant")
                texts.append(txt)
                tools.append(None if idx % 3 != 2 else _TOOLS[doc_id % len(_TOOLS)])
                tss.append(ts0 + idx * 45_000_000)
    turns_tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    truth_tbl = pa.table({
        "conv_id": pa.array(t_conv, pa.string()),
        "entity_id": pa.array(t_ent, pa.int64()),
    }, schema=TRUTH_SCHEMA)
    return turns_tbl, truth_tbl
