"""Column-expression helpers shared across operators and queries."""

from morphl_community_edition_spark.functions.hashing import md5_long60, word_hash_expr

__all__ = ["md5_long60", "word_hash_expr"]
