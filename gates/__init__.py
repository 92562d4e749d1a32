"""Gate implementations for the driver contract, split from
``__spark_entry__.py`` (VERDICT r8 item 7): each module holds one
section of the registry in the ORIGINAL file order, chained by star
imports so the final namespace is identical to the single-file
layout. ``__spark_entry__.py`` keeps only the driver contract
(entry/queries/oracle_sql + the gate window).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
