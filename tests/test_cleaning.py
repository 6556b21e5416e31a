from parquet_pipeline_spark.sources.cleaning import clean_column_names


def test_basic_normalization():
    assert clean_column_names([" Relative humidity."]) == ["relative_humidity"]


def test_collision_dedup_suffixes():
    # FIXTURES.md §3: 'Col A' / 'Col.A' collide → col_a, col_a_1
    assert clean_column_names(["Col A", "Col.A"]) == ["col_a", "col_a_1"]
    assert clean_column_names(["x", "x", "x"]) == ["x", "x_1", "x_2"]


def test_whitespace_and_newlines():
    assert clean_column_names(["first\nname", "  b  c  "]) == ["first_name", "b_c"]


def test_empty_and_symbol_only_headers():
    out = clean_column_names(["", "###", "ok"])
    assert out[2] == "ok"
    assert out[0] == "col" and out[1] == "col_1"


def test_already_clean_stays():
    names = ["l_orderkey", "l_extendedprice"]
    assert clean_column_names(names) == names


def test_variant_b_punctuation_to_underscore():
    # variant B maps punctuation straight to '_' but runs of '_' are
    # collapsed in both variants (we canonicalize the output shape)
    assert clean_column_names(["Col.A"], variant="b") == ["col_a"]
