from dudb_spark.functions.units import format_bytes


def test_decimal_units():
    assert format_bytes(0) == "0 B"
    assert format_bytes(999) == "999 B"
    assert format_bytes(1000) == "1 KB"
    assert format_bytes(1500) == "1.5 KB"
    assert format_bytes(2_000_000) == "2 MB"
    assert format_bytes(3_500_000_000) == "3.5 GB"


def test_binary_units():
    assert format_bytes(1023, binary=True) == "1023 B"
    assert format_bytes(1024, binary=True) == "1 KiB"
    assert format_bytes(1536, binary=True) == "1.5 KiB"
    assert format_bytes(1048576, binary=True) == "1 MiB"


def test_negative_and_precision():
    assert format_bytes(-1500) == "-1.5 KB"
    assert format_bytes(1234, precision=1) == "1.2 KB"
