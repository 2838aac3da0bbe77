"""Configurable scoring heuristics + the ArticleTextExtractor facade.

The reference exposes its weight regexes as per-instance tunables
(ArticleTextExtractor.java:329-377: setUnlikely/addUnlikely, setPositive/
addPositive, setHighlyPositive, setNegative/addNegative, setHighlyNegative,
setToRemove, plus setOutputFormatter at :378). `Heuristics` mirrors that
surface; the module-level defaults in constants.py are the constructor
strings (:314-326). `ArticleTextExtractor` is the drop-in facade so a
reference user can port `new ArticleTextExtractor().setNegative(...)
.extractContent(html)` one-to-one.

set_x(s) replaces the pattern (compiled case-insensitive, like the
reference); add_x(s) appends `|s` to the current pattern source (:335).
"""

from __future__ import annotations

import re

from . import constants as C


class Heuristics:
    """Mutable pattern set for candidate scoring / boilerplate stripping."""

    def __init__(self):
        self.unlikely = C.UNLIKELY
        self.positive = C.POSITIVE
        self.highly_positive = C.HIGHLY_POSITIVE
        self.negative = C.NEGATIVE
        self.highly_negative = C.HIGHLY_NEGATIVE
        self.negative_style = C.NEGATIVE_STYLE
        self.to_remove = C.TO_REMOVE

    # reference :329-337
    def set_unlikely(self, pattern: str) -> "Heuristics":
        self.unlikely = re.compile(pattern, re.IGNORECASE)
        return self

    def add_unlikely(self, pattern: str) -> "Heuristics":
        return self.set_unlikely(self.unlikely.pattern + "|" + pattern)

    # reference :339-353
    def set_positive(self, pattern: str) -> "Heuristics":
        self.positive = re.compile(pattern, re.IGNORECASE)
        return self

    def add_positive(self, pattern: str) -> "Heuristics":
        return self.set_positive(self.positive.pattern + "|" + pattern)

    def set_highly_positive(self, pattern: str) -> "Heuristics":
        self.highly_positive = re.compile(pattern, re.IGNORECASE)
        return self

    # reference :355-369
    def set_negative(self, pattern: str) -> "Heuristics":
        self.negative = re.compile(pattern, re.IGNORECASE)
        return self

    def add_negative(self, pattern: str) -> "Heuristics":
        return self.set_negative(self.negative.pattern + "|" + pattern)

    def set_highly_negative(self, pattern: str) -> "Heuristics":
        self.highly_negative = re.compile(pattern, re.IGNORECASE)
        return self

    # reference :372-376
    def set_to_remove(self, pattern: str) -> "Heuristics":
        self.to_remove = re.compile(pattern, re.IGNORECASE)
        return self


DEFAULT = Heuristics()


class ArticleTextExtractor:
    """Facade matching the reference's configuration API one-to-one."""

    def __init__(self):
        self.heuristics = Heuristics()
        self.formatter = None

    def set_unlikely(self, s):
        self.heuristics.set_unlikely(s)
        return self

    def add_unlikely(self, s):
        self.heuristics.add_unlikely(s)
        return self

    def set_positive(self, s):
        self.heuristics.set_positive(s)
        return self

    def add_positive(self, s):
        self.heuristics.add_positive(s)
        return self

    def set_highly_positive(self, s):
        self.heuristics.set_highly_positive(s)
        return self

    def set_negative(self, s):
        self.heuristics.set_negative(s)
        return self

    def add_negative(self, s):
        self.heuristics.add_negative(s)
        return self

    def set_highly_negative(self, s):
        self.heuristics.set_highly_negative(s)
        return self

    def set_to_remove(self, s):
        self.heuristics.set_to_remove(s)
        return self

    def set_output_formatter(self, formatter):
        self.formatter = formatter
        return self

    def extract_content(self, html: str, url: str = "",
                        max_content_size: int = 0,
                        extract_images: bool = True) -> dict:
        from .extractor import extract
        return extract(html, url=url, max_content_size=max_content_size,
                       extract_images=extract_images, formatter=self.formatter,
                       heuristics=self.heuristics)
