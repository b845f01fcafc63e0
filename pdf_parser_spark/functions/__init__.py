"""Native-column function library (JVM-side, whole-stage codegen).

Import surface for the scalar ports — see functions/scalar.py for the
parity contract with the pure-Python golden layer in extraction_core.
"""

from pdf_parser_spark.functions.scalar import (  # noqa: F401
    amount_fragment_col,
    clean_contra_col,
    force_map_to_allowed,
    mapped_account_col,
    summary_interest_col,
    to_number_col,
    valid_amount_col,
)
