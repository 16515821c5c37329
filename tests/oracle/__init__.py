from tests.oracle.oracle import OracleMapper, OracleMapping  # noqa: F401
