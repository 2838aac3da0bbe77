"""Output formatting (SURVEY.md §2.4, O1-O9) — reimplements
OutputFormatter.java (/root/reference/src/main/java/de/jetwick/snacktory/).

Takes the elected top node and materializes the article text: paragraph
selection (p/ol/em/ul/li/small/blockquote), negative-gravity pruning, hidden
text skipping, letters-ratio junk gate, \n\n joining, whole-text fallback
with a 0.25 kept/total ratio check, and a final re-parse to strip stray tags.
"""

from __future__ import annotations

import re

from .dom import Element, TextNode, parse as dom_parse
from .shelper import count_letters, inner_trim
from .weights import get_score

MIN_FIRST_PARAGRAPH_TEXT = 50  # OutputFormatter.java:24
MIN_PARAGRAPH_TEXT = 30        # OutputFormatter.java:25

_UNLIKELY_DEFAULT = re.compile(r"display\:none|visibility\:hidden")


class OutputFormatter:
    """OutputFormatter.java:20-287."""

    def __init__(self, min_first_paragraph_text: int = MIN_FIRST_PARAGRAPH_TEXT,
                 min_paragraph_text: int = MIN_PARAGRAPH_TEXT):
        self.min_first_paragraph_text = min_first_paragraph_text
        self.min_paragraph_text = min_paragraph_text
        self.nodes_to_keep_css = "p, ol, em, ul, li, small, blockquote"
        self.clear_whitespace = True
        self.unlikely_pattern = _UNLIKELY_DEFAULT

    def set_nodes_to_keep_css_selector(self, selector: str) -> None:
        self.nodes_to_keep_css = selector

    # -- main entry (:73-102) ---------------------------------------------------

    def get_formatted_text(self, top_node: Element, remove_negative: bool = True) -> str:
        self._set_paragraph_index(top_node, self.nodes_to_keep_css)
        if remove_negative:
            self._remove_nodes_with_negative_scores(top_node)
        sb: list[str] = []
        count_of_p = self._append(top_node, sb, self.nodes_to_keep_css)
        out = "".join(sb)
        text = inner_trim(out) if self.clear_whitespace else out

        top_node_length = len(top_node.text())
        if top_node_length == 0:
            top_node_length = 1

        low_text_ratio = (len(text) / (top_node_length * 1.0)) < 0.25
        if len(text) > 100 and count_of_p > 0 and not low_text_ratio:
            return text

        # no subelements
        if (not text
                or (top_node.text() and len(text) <= len(top_node.own_text()))
                or count_of_p == 0 or low_text_ratio):
            text = top_node.text()

        # re-parse to strip any stray tags from broken html (:99-101)
        return dom_parse(text).text()

    # -- negative pruning (:109-119) ---------------------------------------------

    def _remove_nodes_with_negative_scores(self, top_node: Element) -> None:
        for item in top_node.select("*[gravityScore]"):
            score = get_score(item)
            paragraph_index = self._get_paragraph_index(item)
            if score < 0 or len(item.text()) < self._get_min_paragraph(paragraph_index):
                if item.parent is not None:
                    item.remove()

    # -- paragraph emission (:121-188) ----------------------------------------------

    def _append(self, node: Element, sb: list[str], tag_names: str) -> int:
        count_of_p = 0
        paragraph_with_text_index = 0
        has_paragraph = False

        for e in node.select(tag_names):
            # leading lists are assumed to not be part of the content (:134-141)
            if not has_paragraph:
                if e.tag in ("ul", "li"):
                    continue
                has_paragraph = True

            # skip nodes under an unlikely ancestor, up to `node` (:144-149)
            tmp = e
            skip = False
            while tmp is not None and tmp is not node:
                if self._unlikely(tmp):
                    skip = True
                    break
                tmp = tmp.parent
            if skip:
                continue

            if e.has_attr("contentextracted"):
                continue

            text = self._node_to_text(e)

            if e.tag != "em":
                if (not text
                        or len(text) < self._get_min_paragraph(paragraph_with_text_index)
                        or len(text) > count_letters(text) * 2):
                    continue

            # mark nested keep-nodes as visited (:166-170)
            for child_node in e.select(tag_names):
                child_node.set_attr("contentextracted", "true")

            if e.tag == "p":
                count_of_p += 1

            if paragraph_with_text_index > 0 and len(text) > 1:
                sb.append("\n\n")
            sb.append(text)
            paragraph_with_text_index += 1

        return count_of_p

    # -- helpers ----------------------------------------------------------------------

    def _set_paragraph_index(self, node: Element, tag_names: str) -> None:
        for paragraph_index, e in enumerate(node.select(tag_names)):
            e.set_attr("paragraphindex", str(paragraph_index))

    def _get_min_paragraph(self, paragraph_index: int) -> int:
        if paragraph_index < 1:
            return self.min_first_paragraph_text
        return self.min_paragraph_text

    def _get_paragraph_index(self, el: Element) -> int:
        try:
            return int(el.attr("paragraphindex"))
        except (TypeError, ValueError):
            return -1

    def _unlikely(self, node) -> bool:
        """OutputFormatter.java:221-230."""
        clazz = node.attr("class")
        if clazz and "caption" in clazz.lower():
            return True
        style = node.attr("style")
        if self.unlikely_pattern.search(style) or self.unlikely_pattern.search(clazz):
            return True
        return False

    def append_text_skip_hidden(self, e: Element, accum: list[str]) -> None:
        """OutputFormatter.java:232-253."""
        is_data = e.tag in ("script", "style")
        for child in e.child_nodes:
            if self._unlikely(child):
                continue
            if isinstance(child, TextNode):
                if is_data:  # jsoup DataNode, not a TextNode
                    continue
                accum.append(child.text())
            elif isinstance(child, Element):
                if accum and child.is_block and not _last_char_is_whitespace(accum):
                    accum.append(" ")
                elif child.tag == "br":
                    accum.append(" ")
                self.append_text_skip_hidden(child, accum)
                if child.tag == "cite":  # used in cnn.com
                    accum.append(" ")

    def _node_to_text(self, el: Element) -> str:
        sb: list[str] = []
        self.append_text_skip_hidden(el, sb)
        return "".join(sb)


_JAVA_WS_CHARS = set("\t\n\x0b\f\r\x1c\x1d\x1e\x1f ")


def _last_char_is_whitespace(accum: list[str]) -> bool:
    # Java Character.isWhitespace: excludes NBSP, unlike Python str.isspace
    if not accum or not accum[-1]:
        return False
    return accum[-1][-1] in _JAVA_WS_CHARS


def make_formatter(params: tuple[int, int, str | None] | None) -> OutputFormatter:
    """Build a per-domain formatter from constants.OUTPUT_FORMATTER_PER_DOMAIN."""
    f = OutputFormatter()
    if params is not None:
        min_first, min_para, keep_css = params
        f = OutputFormatter(min_first, min_para)
        if keep_css:
            f.set_nodes_to_keep_css_selector(keep_css)
    return f
