"""stderr logging, level from -v count (reference: src/log.rs:9-31)."""

import logging
import sys

LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG, 3: 5}


def init_logger(verbose: int):
    level = LEVELS.get(min(verbose, 3), logging.WARNING)
    logging.basicConfig(
        stream=sys.stderr,
        level=level,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
    )
