"""plugin-parsedoc port: HTML/Markdown -> indexable (type, content, path)
records.

Reference: packages/plugin-parsedoc/src/index.ts:1-243. The reference
pipeline is rehype-parse (parse5 document semantics) -> rehype-preset-
minify (whitespace-only text nodes removed, text collapsed) -> an AST
walk that emits one record per text node
``{type: parentTag, content, path, properties}`` with three merge
strategies (index.ts:180-210):

  * ``merge``  — consecutive text records whose parent containers share
    path-without-last-index AND tag are merged into one record,
    content joined with ' ', FIRST property wins (index.ts:226-233)
  * ``split``  — one record per text node
  * ``both``   — the split record is spliced before the merged one

Path strings replicate the reference exactly: ``root[i].tag[j]...`` with
the text node's own segment stripped (index.ts:188). Document wrapping
replicates parse5: a DOCTYPE occupies root[0]; <head>/<body> are always
materialized; fragment input lands in body. ``transform_fn`` is the
TransformFn seam (tag/content rewrites; raw rewrites re-parse the
fragment, index.ts:150-178).

Markdown support covers the block constructs the reference test corpus
uses plus setext headings, lists, blockquotes, thematic breaks (see
markdown_to_html) and the inline constructs code spans, emphasis,
strong, links, and images (``_inline``) — each inline element becomes
its own AST node, so e.g. ``**bold**`` inside a paragraph yields a
``strong``-typed record, exactly as the rehype AST walk does. Deeply
nested list/blockquote containers remain out of scope (COVERAGE.md).

Spark surface: ``parse_records_df`` maps the pure-Python parser over an
html column with ``mapInPandas`` (Arrow-batched, map-only — the explode
pipelines into the scan; no shuffle), yielding one row per record ready
for ``IndexBuilder.build``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable, Iterator, List, Optional

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_HEAD_TAGS = frozenset("title meta link base style script noscript template".split())


@dataclass
class _El:
    tag: str
    properties: dict = field(default_factory=dict)
    children: list = field(default_factory=list)  # _El | str (text)


class _TreeBuilder(HTMLParser):
    """Lenient HTML -> tree; unclosed tags close at parent boundaries."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _El("#root")
        self.stack = [self.root]
        self.saw_doctype = False
        self.saw_html = False

    def handle_decl(self, decl: str) -> None:
        if decl.lower().startswith("doctype"):
            self.saw_doctype = True

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "html":
            self.saw_html = True
        el = _El(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(
            _El(tag, {k: (v if v is not None else "") for k, v in attrs})
        )

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        self.stack[-1].children.append(data)


_WS = re.compile(r"\s+")


def _minify(el: _El) -> None:
    """rehype-preset-minify's effect on text: drop whitespace-only
    nodes, collapse internal runs, trim element-edge whitespace."""
    out = []
    for ch in el.children:
        if isinstance(ch, str):
            collapsed = _WS.sub(" ", ch)
            if collapsed.strip():
                out.append(collapsed.strip())
        else:
            _minify(ch)
            out.append(ch)
    el.children = out


def _document(root: _El, saw_doctype: bool, saw_html: bool) -> tuple[list, int]:
    """parse5 document semantics: root children = [doctype?, html];
    html children = [head, body]; fragment content lands in body.
    Returns (root_children_after_doctype, html_root_index)."""
    if saw_html:
        html = next(
            ch for ch in root.children if isinstance(ch, _El) and ch.tag == "html"
        )
    else:
        html = _El("html")
        head_kids, body_kids = [], []
        for ch in root.children:
            if isinstance(ch, _El) and ch.tag in ("head", "body"):
                # explicit head/body without <html> wrapper
                html.children.append(ch)
            elif isinstance(ch, _El) and ch.tag in _HEAD_TAGS:
                head_kids.append(ch)
            else:
                body_kids.append(ch)
        if not any(isinstance(c, _El) and c.tag == "head" for c in html.children):
            html.children.insert(0, _El("head", children=head_kids))
        if not any(isinstance(c, _El) and c.tag == "body" for c in html.children):
            html.children.append(_El("body", children=body_kids))
    # materialize head/body inside an explicit <html> too
    kids = [c for c in html.children if isinstance(c, _El)]
    if not any(c.tag == "head" for c in kids):
        html.children.insert(0, _El("head"))
    if not any(c.tag == "body" for c in kids):
        body = _El("body")
        moved = [
            c
            for c in html.children
            if not (isinstance(c, _El) and c.tag == "head")
        ]
        html.children = [
            c for c in html.children if isinstance(c, _El) and c.tag == "head"
        ] + [body]
        body.children = moved
    html_index = 1 if saw_doctype else 0
    return [html], html_index


# ------------------------------------------------------------ records


def parse_html_records(
    html: str,
    base_path: str = "",
    merge_strategy: str = "merge",
    transform_fn: Optional[Callable[[dict], dict]] = None,
) -> List[dict]:
    """Parse one HTML document into parsedoc records (pure Python —
    shared by the Spark operator, the tests, and any driver oracle)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root
    _minify(root)
    children, html_index = _document(root, builder.saw_doctype, builder.saw_html)

    records: List[dict] = []
    for el in children:
        _visit(el, f"{base_path}root[{html_index}]", records, merge_strategy,
               transform_fn)
    return records


def _to_string(el: _El) -> str:
    parts = []
    for ch in el.children:
        parts.append(ch if isinstance(ch, str) else _to_string(ch))
    return "".join(parts)


def _visit(
    node: _El,
    path: str,
    records: List[dict],
    merge_strategy: str,
    transform_fn,
) -> None:
    if transform_fn is not None:
        node = _apply_transform(node, transform_fn)
    for i, child in enumerate(node.children):
        if isinstance(child, str):
            _add_record(child, node.tag, f"{path}.{node.tag}[{i}]",
                        node.properties, records, merge_strategy)
        else:
            _visit(child, f"{path}.{node.tag}[{i}]", records,
                   merge_strategy, transform_fn)


def _apply_transform(node: _El, transform_fn) -> _El:
    prepared = {
        "tag": node.tag,
        "content": _to_string(node),
        "raw": _to_html(node),
        "properties": dict(node.properties),
    }
    out = transform_fn(dict(prepared))
    if "raw" in out and out["raw"] != prepared["raw"]:
        # raw rewrite wins (index.ts:164-178): re-parse the fragment
        b = _TreeBuilder()
        b.feed(out["raw"])
        b.close()
        _minify(b.root)
        replaced = next(
            (c for c in b.root.children if isinstance(c, _El)), _El(node.tag)
        )
        replaced.properties = {
            **replaced.properties,
            **out.get("additional_properties", {}),
        }
        return replaced
    changed = node
    if out.get("tag") != prepared["tag"]:
        changed = _El(out["tag"], dict(node.properties), list(node.children))
    if out.get("content") != prepared["content"]:
        changed = _El(changed.tag, dict(changed.properties), [out["content"]])
    changed.properties = {
        **changed.properties,
        **out.get("additional_properties", {}),
    }
    return changed


def _to_html(el: _El) -> str:
    attrs = "".join(f' {k}="{v}"' for k, v in el.properties.items())
    inner = "".join(
        ch if isinstance(ch, str) else _to_html(ch) for ch in el.children
    )
    if el.tag in _VOID:
        return f"<{el.tag}{attrs}>"
    return f"<{el.tag}{attrs}>{inner}</{el.tag}>"


def _path_without_last_index(path: str) -> str:
    return path[: path.rfind("[")]


def _is_mergeable(parent_path: str, tag: str, records: List[dict]) -> bool:
    if not records:
        return False
    last = records[-1]
    return (
        _path_without_last_index(parent_path)
        == _path_without_last_index(last["path"])
        and tag == last["type"]
    )


def _add_record(
    content: str,
    tag: str,
    path: str,
    properties: dict,
    records: List[dict],
    merge_strategy: str,
) -> None:
    parent_path = path[: path.rfind(".")]
    new = {"type": tag, "content": content, "path": parent_path,
           "properties": dict(properties)}
    if merge_strategy == "merge":
        if not _is_mergeable(parent_path, tag, records):
            records.append(new)
            return
        _merge_into_last(records, content, properties)
    elif merge_strategy == "split":
        records.append(new)
    elif merge_strategy == "both":
        if not _is_mergeable(parent_path, tag, records):
            records.append(new)
            records.append(dict(new))
            return
        records.insert(len(records) - 1, new)
        _merge_into_last(records, content, properties)
    else:
        raise ValueError(f"unknown merge strategy: {merge_strategy}")


def _merge_into_last(records: List[dict], content: str, properties: dict) -> None:
    last = records[-1]
    last["content"] += f" {content}"
    # FIRST property wins (index.ts:226-233: {...properties, ...last})
    last["properties"] = {**properties, **last["properties"]}


# ------------------------------------------------------------ markdown

# ---- inline constructs (CommonMark subset; remark-rehype mapping:
# `x` -> <code>, **x**/__x__ -> <strong>, *x*/_x_ -> <em>,
# [t](u "title") -> <a>, ![a](u) -> <img/>).  Code spans bind tightest
# (protected via placeholders before any other rule); images before
# links; strong before em; `_` runs require non-word flanks (CommonMark
# intraword-underscore rule).
_CODE_SPAN = re.compile(r"(`+)(.+?)\1")
_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)(?:\s+\"([^\"]*)\")?\)")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)(?:\s+\"([^\"]*)\")?\)")
_STRONG_AST = re.compile(r"\*\*(?!\s)(.+?)(?<![\s*])\*\*")
_EM_AST = re.compile(r"\*(?!\s)([^*]+?)(?<!\s)\*")
_STRONG_UND = re.compile(r"(?<![\w_])__(?!\s)(.+?)(?<![\s_])__(?![\w_])")
_EM_UND = re.compile(r"(?<![\w_])_(?!\s)([^_]+?)(?<!\s)_(?![\w_])")


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _inline(text: str) -> str:
    """Render inline CommonMark constructs to HTML.  Code-span contents
    are protected first (no markup applies inside them), then images,
    links, strong, em — the CommonMark precedence for this subset."""
    spans: List[str] = []

    def stash(m: re.Match) -> str:
        body = m.group(2)
        # CommonMark: strip ONE space from both ends when both present
        # and the content is not all spaces
        if len(body) >= 2 and body[0] == " " and body[-1] == " " and body.strip():
            body = body[1:-1]
        spans.append("<code>" + _esc(body) + "</code>")
        return f"\x00{len(spans) - 1}\x00"

    text = _CODE_SPAN.sub(stash, text)
    text = _IMAGE.sub(
        lambda m: f'<img src="{m.group(2)}" alt="{m.group(1)}"/>', text
    )
    text = _LINK.sub(
        lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', text
    )
    text = _STRONG_AST.sub(lambda m: f"<strong>{m.group(1)}</strong>", text)
    text = _EM_AST.sub(lambda m: f"<em>{m.group(1)}</em>", text)
    text = _STRONG_UND.sub(lambda m: f"<strong>{m.group(1)}</strong>", text)
    text = _EM_UND.sub(lambda m: f"<em>{m.group(1)}</em>", text)
    for i, s in enumerate(spans):
        text = text.replace(f"\x00{i}\x00", s)
    return text


_FENCE = re.compile(r"^```")
_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT_H1 = re.compile(r"^=+\s*$")
_SETEXT_H2 = re.compile(r"^-+\s*$")
_BULLET = re.compile(r"^[-*+]\s+(.*)$")
_ORDERED = re.compile(r"^(\d{1,9})[.)]\s+(.*)$")
_QUOTE = re.compile(r"^>\s?(.*)$")
_HR = re.compile(r"^ {0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")


def markdown_to_html(md: str) -> str:
    """md->html for the CommonMark block constructs the reference's
    remark-parse/remark-rehype pipeline maps to HTML elements: ATX +
    setext headings, paragraphs, fenced code, unordered/ordered lists
    (tight; ``start`` attribute per CommonMark when the first ordered
    marker is not 1), blockquotes (consecutive quote lines merge into
    one element, per the CommonMark lazy-continuation rule for the
    common prefixed form), and thematic breaks.  Inline constructs
    (code spans, emphasis/strong, links, images — see ``_inline``)
    render inside paragraphs, headings, and list items; deeply nested
    containers remain out of scope (documented in COVERAGE.md).
    The reference additionally runs rehype-document, which adds a
    DOCTYPE — emitted here so paths match (root[1].html[...])."""
    lines = md.split("\n")
    out, para, i = [], [], 0

    def flush() -> None:
        if para:
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para.clear()

    while i < len(lines):
        ln = lines[i]
        if _FENCE.match(ln):
            flush()
            code = []
            i += 1
            while i < len(lines) and not _FENCE.match(lines[i]):
                code.append(lines[i])
                i += 1
            out.append("<pre><code>" + _esc("\n".join(code)) + "</code></pre>")
        elif m := _ATX.match(ln):
            flush()
            out.append(
                f"<h{len(m.group(1))}>{_inline(m.group(2))}</h{len(m.group(1))}>"
            )
        elif para and _SETEXT_H1.match(ln):
            # setext: the pending paragraph becomes the heading
            out.append(f"<h1>{_inline(' '.join(para))}</h1>")
            para.clear()
        elif para and _SETEXT_H2.match(ln):
            out.append(f"<h2>{_inline(' '.join(para))}</h2>")
            para.clear()
        elif _HR.match(ln):
            # thematic breaks INTERRUPT paragraphs (CommonMark): '***',
            # '___', '- - -' after a paragraph flush it and emit <hr/>.
            # Only a contiguous '-' run is a setext h2 — _SETEXT_H2
            # matched it above before reaching here.
            flush()
            out.append("<hr/>")
        elif m := _BULLET.match(ln):
            flush()
            marker = ln.lstrip()[0]
            items = [m.group(1).strip()]
            while (
                i + 1 < len(lines)
                and (m2 := _BULLET.match(lines[i + 1]))
                and lines[i + 1].lstrip()[0] == marker  # CommonMark: a
                # different bullet char starts a new list
            ):
                items.append(m2.group(1).strip())
                i += 1
            out.append(
                "<ul>" + "".join(f"<li>{_inline(it)}</li>" for it in items) + "</ul>"
            )
        elif m := _ORDERED.match(ln):
            flush()
            start = int(m.group(1))
            items = [m.group(2).strip()]
            while i + 1 < len(lines) and (m2 := _ORDERED.match(lines[i + 1])):
                items.append(m2.group(2).strip())
                i += 1
            attr = f' start="{start}"' if start != 1 else ""
            out.append(
                f"<ol{attr}>" + "".join(f"<li>{_inline(it)}</li>" for it in items) + "</ol>"
            )
        elif m := _QUOTE.match(ln):
            flush()
            quoted = [m.group(1)]
            while i + 1 < len(lines) and (m2 := _QUOTE.match(lines[i + 1])):
                quoted.append(m2.group(1))
                i += 1
            inner = markdown_to_html("\n".join(quoted))
            body = inner.split("<body>", 1)[1].rsplit("</body>", 1)[0]
            out.append("<blockquote>" + body + "</blockquote>")
        elif not ln.strip():
            flush()
        else:
            para.append(ln.strip())
        i += 1
    flush()
    return "<!doctype html><html><head></head><body>" + "".join(out) + "</body></html>"


def parse_md_records(
    md: str,
    base_path: str = "",
    merge_strategy: str = "merge",
    transform_fn: Optional[Callable[[dict], dict]] = None,
) -> List[dict]:
    return parse_html_records(
        markdown_to_html(md), base_path, merge_strategy, transform_fn
    )


# ------------------------------------------------------------ Spark


def parse_records_df(
    docs,
    html_col: str = "html",
    id_col: str = "doc_id",
    path_prefix_col: Optional[str] = None,
    merge_strategy: str = "merge",
    transform_fn: Optional[Callable[[dict], dict]] = None,
):
    """Explode an html column into parsedoc records: one row per record
    (id, record_idx, type, content, path, properties). Map-only
    mapInPandas — the parser pipelines into the scan, no shuffle; at
    100 TB this distributes trivially (html never leaves its partition).
    """
    import pandas as pd
    from pyspark.sql.types import (
        LongType, MapType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("record_idx", LongType()),
            StructField("type", StringType()),
            StructField("content", StringType()),
            StructField("path", StringType()),
            StructField("properties", MapType(StringType(), StringType())),
        ]
    )
    cols = [id_col, html_col] + ([path_prefix_col] if path_prefix_col else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                did = getattr(tup, id_col)
                html = getattr(tup, html_col) or ""
                prefix = (
                    getattr(tup, path_prefix_col) if path_prefix_col else ""
                ) or ""
                for i, rec in enumerate(
                    parse_html_records(html, prefix, merge_strategy, transform_fn)
                ):
                    rows.append(
                        (did, i, rec["type"], rec["content"], rec["path"],
                         {str(k): str(v) for k, v in rec["properties"].items()})
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "record_idx", "type", "content", "path",
                         "properties"],
            )

    return docs.select(*cols).mapInPandas(gen, schema)
