import hashlib

import numpy as np
import pyarrow as pa

from diffdataflowmlpipelines_ray.functions.hashing import stable_hash60, stable_hash60_array
from diffdataflowmlpipelines_ray.functions.tokenize import (
    default_tokenizer,
    flatten_tokens,
    tokenize_column,
)


def test_default_tokenizer_matches_reference_semantics():
    # utils.rs:3-9: split_whitespace drops empties, handles tabs/newlines
    assert default_tokenizer("a  b\tc\nd ") == ["a", "b", "c", "d"]
    assert default_tokenizer("") == []
    assert default_tokenizer("   ") == []


def test_tokenize_column_matches_scalar():
    texts = ["hello world", "  lead trail  ", "", "one", "a\tb\nc"]
    col = pa.array(texts)
    lists = tokenize_column(col)
    assert lists.to_pylist() == [default_tokenizer(t) for t in texts]


def test_flatten_tokens():
    lists = tokenize_column(pa.array(["a b", "", "c"]))
    flat, ids = flatten_tokens(lists, np.array([10, 20, 30]))
    assert flat.to_pylist() == ["a", "b", "c"]
    assert ids.tolist() == [10, 10, 30]


def test_stable_hash60_matches_duckdb():
    import duckdb

    tokens = ["abc", "hello", "Bratwurst", ""]
    py = [stable_hash60(t) for t in tokens]
    sql = duckdb.sql(
        "SELECT (('0x' || substr(md5(t), 1, 15))::BIGINT) FROM (SELECT unnest(?) AS t)",
        params=[tokens],
    ).fetchall()
    assert py == [r[0] for r in sql]
    assert stable_hash60_array(tokens).tolist() == py
    # documented value
    assert stable_hash60("abc") == int(hashlib.md5(b"abc").hexdigest()[:15], 16)
