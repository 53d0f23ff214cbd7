#!/usr/bin/env python3
"""Generate the local soak cuts (soak/sf0.5, soak/sf1.0) for SOAK_r*.md.

Mirrors the driver's sf0.1 documents/embeddings distributions (measured,
not copied: a 30-word generation vocab — sf0.1's measured 31 distinct
words include the "dup" near-dup marker this generator also appends —
10-100 words/doc uniform, lang en ~40% + 4 langs ~15% each, 20 uniform
sources, ~0.2% exact dups + "dup"-marked near-dups, 64-dim isotropic
unit embeddings with 10 uniform labels) at 5x and 10x the sf0.1 row
counts. Other tables are symlinked from sf0.1 — the soak only exercises
the documents/embeddings operators.

Deterministic: seed 42. Committed (unlike the r4/r6 generators, which
were ephemeral) so any future round reproduces the exact same cut —
candidate counts are comparable across rounds from r7 on; r6's sf0.5
counts came from a different same-distribution sample.

RELATION BETWEEN CUTS (don't call them independent): each cut restarts
Random(42) and documents are generated first, so sf1.0's first 25,000
documents are byte-identical to sf0.5's whole documents table — a
prefix-nested relationship, which is FINE for scaling comparisons (pure
growth over shared base data). The embeddings are NOT nested (they
continue the stream at different offsets), so document- and
embedding-side soak trends come from differently-related samples.
Changing any of this would invalidate the committed SOAK_r07.md numbers;
keep generation byte-identical.

The driver's /root/testdata is read-only and NEVER touched. Python here
is tooling only (test-data generation), not engine code.

Usage: python3 tools/gen_soak.py [outRoot=soak]
"""
import os, random, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en"] * 8 + ["de", "es", "fr", "zh"] * 3  # en ~40%, others ~15%


def gen_documents(n, rng):
    ids, texts, langs, sources = [], [], [], []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(10, 100))]
        text = " ".join(words)
        r = rng.random()
        if i > 10 and r < 0.002:           # exact dup of an earlier doc
            text = texts[rng.randrange(i)]
        elif i > 10 and r < 0.004:         # near-dup, "dup"-marked
            text = texts[rng.randrange(i)] + " dup"
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})


BOILERPLATE = ("this document is provided under the standard license terms "
               "of the corpus collection").split()


def gen_documents_zipf(n, rng):
    """Zipfian-gram-df cut for the DECONTAMINATION soak (round-7 verdict
    ask #3): the 30-word-vocab cuts above give every trigram a df that
    grows linearly with the corpus, so a fixed df cap eventually refuses
    the whole index and tx10/tx12 carry no signal at 10x. Natural text is
    zipfian - boilerplate head, enormous unique tail - so this generator
    samples word ranks log-uniformly from a 30k vocabulary (df ~ 1/rank),
    prefixes ~30% of docs with a fixed BOILERPLATE sentence (head grams
    the cap must refuse, observably), and PLANTS contamination: ~25% of
    eval docs (doc_id % 50 == 0, tx10's split) share a unique 6-word
    phrase (4 trigrams, df=2, far under the cap) with the next corpus
    doc. Expected flagged pairs are therefore ~n/200, LINEAR in the
    corpus - nonzero and deterministic at every scale."""
    ids, texts, langs, sources = [], [], [], []
    V = 30_000
    pending_phrase = None  # planted into the doc after its eval twin
    for i in range(n):
        words = [f"w{int(V ** rng.random())}"
                 for _ in range(rng.randint(10, 100))]
        if rng.random() < 0.3:
            words = BOILERPLATE + words
        if i % 50 == 0 and rng.random() < 0.25:
            phrase = [f"leak{i}x{j}" for j in range(6)]
            words += phrase
            pending_phrase = phrase
        elif pending_phrase is not None:
            words += pending_phrase
            pending_phrase = None
        text = " ".join(words)
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})


def gen_documents_chain(n, rng):
    """Long-CHAIN corpus for the dd05-vs-dd09 CC soak (round-8 verdict
    ask #5): the zipf/sf cuts only produce diameter-tiny dup graphs, where
    one-hop propagation (dd05) wins on constant factors - this cut builds
    the corpus shape dd09 exists for. 10 chains of 251 docs each: doc k of
    a chain is a 40-word window at stride 20 over a chain-unique word
    stream, so consecutive docs share 18 of their 38 shingles (jaccard
    18/58 = 0.31 >= 0.05 - an edge), non-consecutive docs share nothing,
    and every shingle has df <= 2 (far under dd05's df-16 cap). The dup
    graph is 10 disjoint paths of DIAMETER 250: dd05's min-label
    propagation needs ~250 one-hop rounds (its maxIter-64 require MUST
    fire), dd09's star contraction ~ceil(log2(250)) + c. The rest is
    unique filler so edge generation still runs at soak scale."""
    CHAINS, CLEN, WORDS, STRIDE = 10, 251, 40, 20
    ids, texts, langs, sources = [], [], [], []
    i = 0
    for c in range(CHAINS):
        stream = [f"c{c}p{p}" for p in range(STRIDE * (CLEN - 1) + WORDS)]
        for k in range(CLEN):
            ids.append(i)
            texts.append(" ".join(stream[STRIDE * k:STRIDE * k + WORDS]))
            langs.append("en")
            sources.append(f"chain{c}")
            i += 1
    while i < n:
        ids.append(i)
        texts.append(" ".join(f"f{i}w{j}" for j in range(rng.randint(10, 100))))
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
        i += 1
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})


def gen_embeddings(n, rng):
    ids, vecs, labels = [], [], []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(64)]
        nrm = sum(x * x for x in v) ** 0.5
        ids.append(i)
        vecs.append([x / nrm for x in v])
        labels.append(rng.randrange(10))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "soak"
    cuts = [("sf0.5", gen_documents, 25_000, 10_000),
            ("sf1.0", gen_documents, 50_000, 20_000),
            # zipfian decontamination cuts (three points so the soak can
            # name a per-doubling ratio); prefix-nested like the sf cuts
            ("zipf0.1", gen_documents_zipf, 5_000, 2_000),
            ("zipf0.5", gen_documents_zipf, 25_000, 10_000),
            ("zipf1.0", gen_documents_zipf, 50_000, 20_000),
            # diameter-250 dup-chain cut (dd05's bound vs dd09's log rounds)
            ("chain", gen_documents_chain, 20_000, 2_000)]
    for name, gen_docs, docs, embs in cuts:
        out = os.path.join(root, name)
        os.makedirs(out, exist_ok=True)
        rng = random.Random(42)  # restarted per cut: documents prefix-nest (see docstring)
        pq.write_table(gen_docs(docs, rng), f"{out}/documents.parquet")
        pq.write_table(gen_embeddings(embs, rng), f"{out}/embeddings.parquet")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events"]:
            dst = f"{out}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF01}/{t}.parquet", dst)
        print(f"wrote {out}: {docs} docs, {embs} embeddings")


if __name__ == "__main__":
    main()
