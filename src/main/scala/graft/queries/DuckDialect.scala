package graft.queries

/** DuckDB-dialect mirrors of the Spark fragments in `graft.operators.Dedup`.
  * Single source of truth for the oracle side: a tokenizer/hash change must
  * touch exactly one Spark fragment and one DuckDB fragment, keeping every
  * oracle-compared query in lock-step. */
object DuckDialect {
  val Tok = """list_filter(string_split_regex(text, '\s+'), x -> x != '')"""
  def hash(v: String) = s"CAST('0x'||substr(md5($v), 1, 15) AS BIGINT)"
  val Shingles =
    "list_distinct(list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' ')))"
}
