"""Candidate scoring & election (SURVEY.md §2.3, C1-C10).

Faithful reimplementation of the gravity-weight heuristics of
ArticleTextExtractor.java:
- getNodes (:3270-3281), calcWeight (:2978-3058), getWeight (:2662-2685),
  weightChildNodes (:2699-2894), getGrandChildWeight (:2896-2943),
  calcWeightForChild (:2963-2976), getBestMatchElements (:689-783),
  stripUnlikelyCandidates (:3132-3148), removeNodesPerDomain (:3153-3170),
  removeScriptsAndStyles (:3193-3210).

Scores are memoized on DOM nodes via the ``gravityscore`` attribute, exactly
like the reference writes ``gravityScore`` into the jsoup tree (the
OutputFormatter later reads it back through a ``*[gravityScore]`` selector).
"""

from __future__ import annotations

import math

from . import constants as C
from .dom import Document, Element
from .heuristics import DEFAULT as _DEFAULT_HEURISTICS, Heuristics
from .shelper import count as s_count


def _java_round(x: float) -> int:
    """Java Math.round: floor(x + 0.5)."""
    return math.floor(x + 0.5)


# class/id attribute values repeat across thousands of elements; memoize the
# regex verdicts per (pattern SOURCE, value). Keyed by the pattern string,
# NOT id(pattern): per-instance Heuristics patterns are garbage-collectable,
# and a freed pattern's address can be reused by a different compiled regex
# (review finding — id() keys could serve stale verdicts). str hashes are
# cached by CPython, so the string key costs one hash after first use.
# Bounded: cleared when oversized.
_VERDICTS: dict[tuple[str, str], bool] = {}


def _hit(pattern, s: str) -> bool:
    key = (pattern.pattern, s)
    v = _VERDICTS.get(key)
    if v is None:
        if len(_VERDICTS) > 100_000:
            _VERDICTS.clear()
        v = pattern.search(s) is not None
        _VERDICTS[key] = v
    return v


# --- gravityScore attribute scratchpad (ArticleTextExtractor.java:2945-2961) --

def get_score(el: Element) -> int:
    # direct attrs read: the key is a lowercase literal, so this is
    # exactly el.attr("gravityscore") minus the per-call key lowering
    # (hot: every add_score reads before it writes)
    try:
        return int(el.attrs.get("gravityscore", ""))
    except (TypeError, ValueError):
        return 0


def set_score(el: Element, score: int) -> None:
    el.set_attr("gravityscore", str(score))


def add_score(el: Element, score: int) -> None:
    set_score(el, get_score(el) + score)


# --- base weight (:2978-3058) ---------------------------------------------------

def calc_weight(e: Element, has_highly_positive: bool,
                heur: Heuristics | None = None) -> tuple[int, bool]:
    h = heur or _DEFAULT_HEURISTICS
    weight = 0
    attrs = e.attrs
    cls = attrs.get("class", "")
    ident = attrs.get("id", "")
    itemprop = attrs.get("itemprop")

    if not has_highly_positive:
        if itemprop is not None and _hit(h.highly_positive, itemprop):
            weight += 350
            has_highly_positive = True
        if cls and _hit(h.highly_positive, cls):
            weight += 200
            has_highly_positive = True
        if ident and _hit(h.highly_positive, ident):
            weight += 90
            has_highly_positive = True

    if cls:
        if _hit(h.positive, cls):
            weight += 35
        if _hit(h.unlikely, cls):
            weight -= 20
        if _hit(h.negative, cls):
            weight -= 50
    if ident:
        if _hit(h.positive, ident):
            weight += 45
        if _hit(h.unlikely, ident):
            weight -= 20
        if _hit(h.negative, ident):
            weight -= 50
        if _hit(h.highly_negative, ident):
            weight -= 700

    style = attrs.get("style")
    if style and _hit(h.negative_style, style):
        weight -= 50

    if itemprop and _hit(h.positive, itemprop):
        weight += 100

    return weight, has_highly_positive


# --- child weights (:2699-2976) --------------------------------------------------

def calc_weight_for_child(child: Element, own_text: str) -> int:
    c = s_count(own_text, "&quot;")
    c += s_count(own_text, "&lt;")
    c += s_count(own_text, "&gt;")
    c += s_count(own_text, "px")
    if c > 5:
        val = -30
    else:
        val = _java_round(len(own_text) / 35.0)
    add_score(child, val)
    return val


def get_grand_child_weight(grandchild: Element) -> int:
    weight = 0
    own_text = grandchild.own_text()
    own_text_length = len(own_text)
    if own_text_length < 20:
        return 0
    if own_text_length > 200:
        weight += max(50, own_text_length // 10)
    tag = grandchild.tag
    if tag in ("h1", "h2"):
        weight += 30
    elif tag in ("div", "p"):
        weight += calc_weight_for_child(grandchild, own_text)
    return weight


def weight_child_nodes(root_el: Element,
                       heur: Heuristics | None = None) -> int:
    h = heur or _DEFAULT_HEURISTICS
    weight = 0
    children_weight = 0
    caption = None
    p_els: list[Element] = []

    children = root_el.children
    for child in children:
        own_text = child.own_text()
        own_text_length = len(own_text)
        if own_text_length < 20:
            continue

        child_weight = 0
        if own_text_length > 200:
            child_weight += max(50, own_text_length // 10)

        tag = child.tag
        if tag in ("h1", "h2"):
            child_weight += 30
        elif tag in ("div", "p"):
            child_weight += calc_weight_for_child(child, own_text)
            if tag == "p" and own_text_length > 50:
                p_els.append(child)
            if child.class_name().lower() == "caption":
                caption = child
        children_weight += child_weight

    weight += children_weight

    # grandchildren & great-grandchildren (:2794-2865)
    grand_children_weight = 0
    great_grand_children_weight = 0
    for child in children:
        # negative-looking children penalize instead of contributing (:2799-2804)
        if _hit(h.negative, child.id()) or _hit(h.negative, child.class_name()):
            grand_children_weight -= 30
            continue
        for grandchild in child.children:
            grand_children_weight += get_grand_child_weight(grandchild)
            for greatgrandchild in grandchild.children:
                great_grand_children_weight += get_grand_child_weight(greatgrandchild)

    weight += _java_round(grand_children_weight * 0.45)
    weight += _java_round(great_grand_children_weight * 0.45)

    if caption is not None:
        weight += 30

    if len(p_els) >= 2:
        for sub_el in children:
            tag = sub_el.tag
            # substring-containment quirks preserved from the original
            # (:2876-2892): e.g. tag "a" matches "table;li;td;th" via "table"
            if tag in "h1;h2;h3;h4;h5;h6":
                weight += 20
            elif tag in "table;li;td;th":
                add_score(sub_el, -30)
            if tag in "p":
                add_score(sub_el, 30)

    return weight


def get_weight(e: Element, checkextra: bool, has_highly_positive: bool,
               heur: Heuristics | None = None) -> tuple[int, bool]:
    """ArticleTextExtractor.getWeight (:2662-2685)."""
    weight, has_highly_positive = calc_weight(e, has_highly_positive, heur)
    weight += _java_round(len(e.own_text()) / 100.0 * 10)
    weight += _java_round(weight_child_nodes(e, heur) * 0.9)
    if checkextra:
        xelem = e.select_first("[extragravityscore]")
        if xelem is not None:
            try:
                weight += int(xelem.attr("extragravityscore"))
            except ValueError:
                pass
    return weight, has_highly_positive


# --- candidate enumeration & election ---------------------------------------------

def get_nodes(doc: Document) -> list[Element]:
    """ArticleTextExtractor.getNodes (:3270-3281): all body elements with an
    interesting tag; seeds gravityScore 100,50,25,... halving."""
    nodes: list[Element] = []
    score = 100
    for body in doc.bodies():
        # inlined pre-order walk (r10): same order as iter_descendants,
        # without the generator resumption per element
        stack = [body]
        pop = stack.pop
        while stack:
            el = pop()
            if el.tag in C.NODES_SET:
                nodes.append(el)
                set_score(el, score)
                score = score // 2
            kids = el.children
            if kids:
                stack.extend(reversed(kids))
    return nodes


def get_best_match_elements(nodes, heur: Heuristics | None = None) -> list[Element]:
    """ArticleTextExtractor.getBestMatchElements (:689-783): elements sorted
    by (weight desc, document position asc)."""
    entries = []
    has_highly_positive = False
    for position, entry in enumerate(nodes):
        weight, has_highly_positive = get_weight(entry, False,
                                                 has_highly_positive, heur)
        entries.append((-weight, position, entry))
    entries.sort(key=lambda t: (t[0], t[1]))
    return [e for _, _, e in entries]


def get_best_match_element(nodes, heur: Heuristics | None = None):
    """ArticleTextExtractor.getBestMatchElement (:680-686)."""
    ordered = get_best_match_elements(nodes, heur)
    return ordered[0] if ordered else None


# --- destructive cleaning (P3, P5, P6) ----------------------------------------------

def strip_unlikely_candidates(doc: Document,
                              heur: Heuristics | None = None) -> None:
    """ArticleTextExtractor.stripUnlikelyCandidates (:3132-3148)."""
    h = heur or _DEFAULT_HEURISTICS
    for body in doc.bodies():
        # snapshot via an inlined pre-order walk (r10; the former
        # list(iter_descendants()) — the list is REQUIRED: removal
        # mutates the tree mid-iteration)
        snapshot: list[Element] = []
        stack = [body]
        pop = stack.pop
        while stack:
            el = pop()
            snapshot.append(el)
            kids = el.children
            if kids:
                stack.extend(reversed(kids))
        for child in snapshot:
            attrs = child.attrs
            class_name = attrs.get("class")
            ident = attrs.get("id")
            if ((class_name and h.to_remove.search(class_name.lower()))
                    or (ident and h.to_remove.search(ident.lower()))):
                child.remove()


def remove_nodes_per_domain(doc: Document, domain_name: str | None) -> None:
    """ArticleTextExtractor.removeNodesPerDomain (:3153-3170)."""
    if domain_name is None:
        return
    selector_list = C.NODES_TO_REMOVE_PER_DOMAIN.get(domain_name)
    if not selector_list:
        return
    for selector in selector_list:
        for item in doc.select(selector):
            item.remove()


def remove_scripts_and_styles(doc: Document, domain: str | None) -> None:
    """ArticleTextExtractor.removeScriptsAndStyles (:3193-3210)."""
    for item in doc.get_elements_by_tag("script"):
        item.remove()
    if domain not in C.REQUIRE_NOSCRIPTS:
        for item in doc.get_elements_by_tag("noscript"):
            item.remove()
    for item in doc.get_elements_by_tag("style"):
        item.remove()
