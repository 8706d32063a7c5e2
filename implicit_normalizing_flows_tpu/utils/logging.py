"""Root-logger setup (reference: ``lib/utils.py:13-37``): file + console
handlers, and the full source text of the entry script logged for provenance.
"""
from __future__ import annotations

import logging
import os


def makedirs(dirname):
    os.makedirs(dirname, exist_ok=True)


def get_logger(logpath, filepath=None, package_files=(), displaying=True,
               saving=True, debug=False):
    logger = logging.getLogger()
    level = logging.DEBUG if debug else logging.INFO
    logger.setLevel(level)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    if saving:
        makedirs(os.path.dirname(logpath) or ".")
        fh = logging.FileHandler(logpath, mode="a")
        fh.setLevel(level)
        logger.addHandler(fh)
    if displaying:
        ch = logging.StreamHandler()
        ch.setLevel(level)
        logger.addHandler(ch)
    if filepath is not None and os.path.isfile(filepath):
        logger.info(filepath)
        with open(filepath) as f:
            logger.info(f.read())
    for f in package_files:
        logger.info(f)
        with open(f) as pf:
            logger.info(pf.read())
    return logger
