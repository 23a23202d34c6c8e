package graft.ops

/** DuckDB twin of the BPE tokenize SERVING path (q182) over the frozen
  * [[BpeMergesArtifact]] — the q137b/q164 train/serve discipline applied
  * to the tokenizer: training (q176's loop, run to depth by
  * `graft.BpeArtifactGen`) has no SQL twin, but APPLYING a persisted merge
  * table is a pure function of literals, so the oracle can evaluate the
  * exact same chained `replace` calls. Both engines' plain `replace` is
  * left-to-right non-overlapping replace-all — the greedy BPE merge
  * semantics BpeMergeSpec pins against an imperative reference. */
object BpeServe {

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The merged string: replace chain in artifact order, innermost first. */
  private def mergedExpr(base: String): String =
    BpeMergesArtifact.merges.foldLeft(base) { case (e, (a, b, _)) =>
      s"replace($e, ${sqlLit(s"|$a||$b|")}, ${sqlLit(s"|$a+$b|")})"
    }

  def oracleSql: String = {
    s"""
      WITH enc AS (
        SELECT doc_id,
          '|' || array_to_string(list_filter(string_split(text, ' '),
            x -> x <> '' AND NOT contains(x, '|') AND NOT contains(x, '+')),
            '||') || '|' AS s
        FROM documents),
      applied AS (
        SELECT doc_id,
          CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT) AS n_tok_raw,
          CAST(len(string_split(trim(${mergedExpr("s")}, '|'), '||')) AS BIGINT)
            AS n_tok_bpe
        FROM enc)
      SELECT doc_id, n_tok_raw, n_tok_bpe,
        n_tok_raw - n_tok_bpe AS n_merged
      FROM applied"""
  }

  /** Twin of q190's per-language fertility rollup over the same frozen
    * merge chain: raw/BPE token totals, raw token chars, and the
    * chars-per-BPE-token compression ratio (one micro-rounded division of
    * exact BIGINT sums). */
  def fertilitySql: String = {
    s"""
      WITH enc AS (
        SELECT lang,
          '|' || array_to_string(list_filter(string_split(text, ' '),
            x -> x <> '' AND NOT contains(x, '|') AND NOT contains(x, '+')),
            '||') || '|' AS s
        FROM documents),
      applied AS (
        SELECT lang,
          CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT) AS raw,
          CAST(len(string_split(trim(${mergedExpr("s")}, '|'), '||')) AS BIGINT)
            AS bpe,
          CAST(list_sum(list_transform(string_split(trim(s, '|'), '||'),
            x -> len(x))) AS BIGINT) AS chars
        FROM enc)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(raw) AS BIGINT) AS raw_tokens,
        CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        CAST(sum(chars) AS BIGINT) AS token_chars,
        floor(CAST(sum(chars) AS BIGINT)::DOUBLE / CAST(sum(bpe) AS BIGINT)
          * 1000000 + 0.5) / 1000000 AS chars_per_bpe_token
      FROM applied GROUP BY 1"""
  }
}
