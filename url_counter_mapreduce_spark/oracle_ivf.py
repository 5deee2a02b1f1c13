"""DuckDB oracle SQL generators for the IVF / IVF-PQ ANN queries.

The trainers (operators/similarity.py: _kmeans_centroids_q) run Lloyd
k-means in integer micro-units — exact L2² assignment, floor-mean centroid
updates — so every training step is associative integer arithmetic that an
independent engine can replay bit-for-bit. These generators unroll the
fixed iteration count into a CTE chain: c0 = seed vectors, then per
iteration an assignment CTE (row_number over exact integer distances, tie
cell ASC) and a floor-mean centroid CTE. Candidate ranking replays the
exact float cosine with the same in-order fold + stable rounding the rest
of the similarity oracles use.

Everything here mirrors a constant in operators/similarity.py — EMB_Q,
N_QUERIES, n_cells/nprobe/iters defaults, PQ_M/PQ_KS/rerank — and the
generated SQL embeds those constants, so a parameter drift breaks the
driver hash instead of passing silently.
"""

from __future__ import annotations

# DuckDB twins of registry._stable_round_sql / _cosine_sql — duplicated
# here (3-line formulas) because registry imports this module.


def _sr(x: str, n: int = 6) -> str:
    s = 10**n
    return f"(floor(({x}) * {s} + 0.5) / {s})"


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _cos(a: str, b: str) -> str:
    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


_FINITE = (
    f"({_dot('embedding', 'embedding')} > 0.0 "
    f"AND NOT isnan({_dot('embedding', 'embedding')}))"
)

# micro-unit quantization — the DuckDB twin of similarity._xq_expr
_XQ = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))"


def _d2(x: str, c: str) -> str:
    """Exact integer L2² between two bigint micro-unit lists."""
    return (
        f"list_sum(list_transform(range(1, len({x}) + 1), "
        f"i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])))"
    )


def _km_ctes(prefix: str, src: str, n_cells: int, iters: int) -> tuple[str, str]:
    """CTE chain replaying _kmeans_centroids_q over CTE ``src`` (vec_id, xq):
    returns (sql_fragment, final_centroid_cte). Seeds = vec_id < n_cells;
    per iteration: exact-integer argmin assignment (tie cell ASC), then
    per-dimension floor mean (s − pmod(s,n)) / n — exactly divisible, so
    any division semantics agree. Requires a ``dims`` CTE of 1..max dim."""
    parts = [
        f"{prefix}c0 AS (SELECT vec_id AS cell, xq AS cq FROM {src} "
        f"WHERE vec_id < {n_cells})"
    ]
    for j in range(1, iters + 1):
        prev = f"{prefix}c{j - 1}"
        parts.append(
            f"""{prefix}a{j} AS (
        SELECT vec_id, xq, cell FROM (
            SELECT e.vec_id, e.xq, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_d2('e.xq', 'c.cq')} ASC, c.cell ASC) AS rn
            FROM {src} e, {prev} c
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""{prefix}s{j} AS (
        SELECT cell, i AS pos,
               CAST(sum(xq[i]) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM {prefix}a{j}, dims WHERE i <= len(xq)
        GROUP BY cell, i
    )"""
        )
        parts.append(
            f"""{prefix}c{j} AS (
        SELECT cell, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY pos) AS cq
        FROM {prefix}s{j} GROUP BY cell
    )"""
        )
    return ",\n    ".join(parts), f"{prefix}c{iters}"


def _assign_cte(name: str, src: str, cents: str, keep: str, where: str = "",
                top: int = 1, rank_col: bool = False) -> str:
    """Assignment CTE: for each src row, the ``top`` nearest centroid cells
    by exact integer L2² (tie cell ASC). ``keep`` = projected columns."""
    rn_out = ", rn" if rank_col else ""
    return f"""{name} AS (
        SELECT {keep}, cell{rn_out} FROM (
            SELECT e.*, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_d2('e.xq', 'c.cq')} ASC, c.cell ASC) AS rn
            FROM {src} e, {cents} c {where}
        ) WHERE rn <= {top}
    )"""


def ivf_oracle_sql(n_queries: int = 8, k: int = 3, n_cells: int = 8,
                   nprobe: int = 2, iters: int = 3) -> str:
    """Exact replay of similarity_ivf: integer Lloyd (unrolled), integer
    probe-cell selection, exact-cosine re-rank of the probed cells."""
    km, cf = _km_ctes("", "eq", n_cells, iters)
    return f"""
    WITH eq AS (
        SELECT vec_id, embedding, {_XQ} AS xq
        FROM embeddings WHERE {_FINITE}
    ),
    dims AS (SELECT unnest(range(1, (SELECT max(len(xq)) FROM eq) + 1)) AS i),
    {km},
    {_assign_cte('af', 'eq', cf, 'vec_id, embedding')},
    {_assign_cte('probes', '(SELECT * FROM eq WHERE vec_id < ' + str(n_queries) + ')',
                 cf, 'vec_id, embedding', top=nprobe)},
    cand AS (
        SELECT p.vec_id AS qid, a.vec_id AS vid,
               {_sr(_cos('p.embedding', 'a.embedding'))} AS cosine
        FROM probes p JOIN af a ON a.cell = p.cell AND a.vec_id <> p.vec_id
    )
    SELECT qid, vid, cosine, rank FROM (
        SELECT qid, vid, cosine,
               CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, vid ASC) AS INT) AS rank
        FROM cand
    ) WHERE rank <= {k}
    """


def ivf_pq_oracle_sql(n_queries: int = 8, k: int = 3, n_cells: int = 8,
                      nprobe: int = 2, rerank: int = 12, iters: int = 3,
                      pq_m: int = 4, dim: int = 64) -> str:
    """Exact replay of similarity_ivf_pq: integer coarse quantizer + M
    integer sub-codebooks (each an unrolled Lloyd chain), ADC scoring via
    dot(raw query subvector, dequantized codeword), top-``rerank`` by
    rounded approx cosine, exact-cosine re-rank to top-k.

    The subspace split is baked at dim=64 (the fixture embedding width at
    every scale); a different width raises loudly via error() instead of
    silently mis-slicing."""
    subdim = dim // pq_m
    pq_ks = 16
    km_coarse, cf = _km_ctes("g", "eq", n_cells, iters)
    book_parts, book_finals = [], []
    for m in range(pq_m):
        lo, hi = m * subdim + 1, (m + 1) * subdim
        book_parts.append(
            f"sub{m} AS (SELECT vec_id, list_slice(xq, {lo}, {hi}) AS xq FROM eq)"
        )
        km_b, bf = _km_ctes(f"b{m}", f"sub{m}", pq_ks, iters)
        book_parts.append(km_b)
        book_finals.append(bf)
        # per-vector code for subspace m (column stays named `cell`;
        # the ADC join below qualifies it as cd{m}.cell)
        book_parts.append(_assign_cte(f"code{m}", f"sub{m}", bf, "vec_id"))
    books_sql = ",\n    ".join(book_parts)
    # ADC terms: join each candidate's code to its codeword, dot against the
    # raw query subvector with the dequantized (cq/1e6) codeword — the same
    # in-order double fold Spark's literal LUT performs
    adc_joins = " ".join(
        f"JOIN code{m} cd{m} ON cd{m}.vec_id = a.vec_id "
        f"JOIN {book_finals[m]} bk{m} ON bk{m}.cell = cd{m}.cell"
        for m in range(pq_m)
    )
    adc_terms = " + ".join(
        "list_sum(list_transform(range(1, %d + 1), i -> "
        "CAST(p.embedding[%d + i] AS DOUBLE) * (CAST(bk%d.cq[i] AS DOUBLE) / 1e6)))"
        % (subdim, m * subdim, m)
        for m in range(pq_m)
    )
    return f"""
    WITH eq AS (
        SELECT vec_id, embedding, {_XQ} AS xq
        FROM embeddings
        WHERE {_FINITE} AND CASE WHEN len(embedding) = {dim} THEN true
              ELSE error('ivf_pq oracle assumes embedding dim {dim}') END
    ),
    dims AS (SELECT unnest(range(1, (SELECT max(len(xq)) FROM eq) + 1)) AS i),
    {km_coarse},
    {books_sql},
    {_assign_cte('af', 'eq', cf, 'vec_id, embedding')},
    {_assign_cte('probes', '(SELECT * FROM eq WHERE vec_id < ' + str(n_queries) + ')',
                 cf, 'vec_id, embedding', top=nprobe)},
    cand AS (
        SELECT p.vec_id AS qid, a.vec_id AS vid,
               p.embedding AS q_emb, a.embedding AS v_emb,
               {_sr('(' + adc_terms + ') / (sqrt(' + _dot('p.embedding', 'p.embedding')
                    + ') * sqrt(' + _dot('a.embedding', 'a.embedding') + '))')}
                   AS approx_cosine
        FROM probes p
        JOIN af a ON a.cell = p.cell AND a.vec_id <> p.vec_id
        {adc_joins}
    ),
    shortlist AS (
        SELECT qid, vid, q_emb, v_emb, approx_cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY approx_cosine DESC, vid ASC) AS arank
            FROM cand
        ) WHERE arank <= {rerank}
    )
    SELECT qid, vid, cosine, approx_cosine, rank FROM (
        SELECT qid, vid, approx_cosine,
               {_sr(_cos('q_emb', 'v_emb'))} AS cosine,
               CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY {_sr(_cos('q_emb', 'v_emb'))} DESC, vid ASC) AS INT) AS rank
        FROM shortlist
    ) WHERE rank <= {k}
    """


def semantic_trained_oracle_sql(n_cells: int, iters: int, tau: float) -> str:
    """Exact replay of dedup_semantic_trained: the integer Lloyd chain for
    cell assignment (same machinery as ivf_oracle_sql), then the SemDeDup
    within-cell prune — rounded cosine ≥ τ against lower-id cell-mates,
    min qualifying id as dup_of."""
    km, cf = _km_ctes("", "eq", n_cells, iters)
    return f"""
    WITH eq AS (
        SELECT vec_id, embedding, {_XQ} AS xq
        FROM embeddings WHERE {_FINITE}
    ),
    dims AS (SELECT unnest(range(1, (SELECT max(len(xq)) FROM eq) + 1)) AS i),
    {km},
    {_assign_cte('af', 'eq', cf, 'vec_id, embedding')},
    sem_dups AS (
        SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
        FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {_sr(_cos('a.embedding', 'b.embedding'))} >= {tau}
        GROUP BY b.vec_id
    )
    SELECT v.vec_id, CAST(v.cell AS BIGINT) AS cell, d.dup_of,
           d.dup_of IS NULL AS keep
    FROM af v LEFT JOIN sem_dups d ON d.vec_id = v.vec_id
    """


def semantic_decon_oracle_sql(n_cells: int, iters: int, tau: float) -> str:
    """Exact replay of decontaminate_semantic: trained-cell assignment
    (same integer Lloyd chain), md5-decile train/test split, cell-blocked
    cosine flagging of test vectors."""
    km, cf = _km_ctes("", "eq", n_cells, iters)
    return f"""
    WITH eq AS (
        SELECT vec_id, embedding, {_XQ} AS xq
        FROM embeddings WHERE {_FINITE}
    ),
    dims AS (SELECT unnest(range(1, (SELECT max(len(xq)) FROM eq) + 1)) AS i),
    {km},
    {_assign_cte('af', 'eq', cf, 'vec_id, embedding')},
    t AS (
        SELECT af.*, CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 10
                   AS decile
        FROM af
    ),
    train AS (SELECT cell, vec_id AS train_id, embedding AS t_emb FROM t WHERE decile < 8),
    test AS (SELECT cell, vec_id, embedding FROM t WHERE decile = 9),
    hits AS (
        SELECT test.vec_id, CAST(count(*) AS BIGINT) AS n_train_near,
               MIN(train_id) AS min_train_id
        FROM test JOIN train USING (cell)
        WHERE {_sr(_cos('test.embedding', 'train.t_emb'))} >= {tau}
        GROUP BY test.vec_id
    )
    SELECT s.vec_id, COALESCE(h.n_train_near, 0) AS n_train_near, h.min_train_id,
           h.min_train_id IS NOT NULL AS flagged
    FROM test s LEFT JOIN hits h ON h.vec_id = s.vec_id
    """


def pca_oracle_sql(iters: int = 3, dims: int = 64) -> str:
    """Unrolled-CTE replay of operators/pipeline.embedding_pca_power:
    power iteration on the uncentered second moment in exact HUGEINT
    arithmetic — v0 = [10⁶]ᵈ; per round a per-row dot (Σ xq[i]·v[i]), a
    per-dimension matvec accumulation (Σ_rows xq[i]·dot), and an L∞
    floor renormalization to micro-units via the non-negative-mod floor
    division ((num − posmod) // m — exactly divisible, so truncation and
    floor agree, matching Python's // on the Spark driver). The final
    round's matvec is normalized the same way for the loadings, and the
    eigenvalue is the Rayleigh quotient Σ dot² / (|v|²·10¹²) with the
    shared 6-dp stable round."""
    parts = [
        f"dims AS (SELECT unnest(range(1, {dims + 1})) AS i)",
        f"e AS MATERIALIZED (SELECT vec_id, {_XQ} AS xq FROM embeddings WHERE {_FINITE})",
        f"v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM dims)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
        SELECT t.vec_id, sum(CAST(t.xq[v.i] AS HUGEINT) * v.v) AS dot
        FROM e t, v{r - 1} v GROUP BY t.vec_id
    )"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
        SELECT dims.i, sum(CAST(t.xq[dims.i] AS HUGEINT) * d.dot) AS s
        FROM e t JOIN d{r} d USING (vec_id), dims GROUP BY dims.i
    )"""
        )
        if r < iters:
            parts.append(
                f"""v{r} AS (
        SELECT w.i,
               CAST((w.s * 1000000 - ((w.s * 1000000 % m.m) + m.m) % m.m) // m.m
                    AS HUGEINT) AS v
        FROM w{r} w, (SELECT greatest(max(abs(s)), 1) AS m FROM w{r}) m
    )"""
            )
    final = f"""SELECT CAST(w.i - 1 AS INT) AS dim,
           CAST(CAST((w.s * 1000000 - ((w.s * 1000000 % m.m) + m.m) % m.m) // m.m
                     AS BIGINT) AS DOUBLE) / 1e6 AS loading,
           {_sr('CAST(r.sq AS DOUBLE) / (CAST(n.vv AS DOUBLE) * 1e12)')} AS eigval
    FROM w{iters} w,
         (SELECT greatest(max(abs(s)), 1) AS m FROM w{iters}) m,
         (SELECT sum(dot * dot) AS sq FROM d{iters}) r,
         (SELECT sum(v * v) AS vv FROM v{iters - 1}) n"""
    return "WITH " + ",\n    ".join(parts) + "\n    " + final
