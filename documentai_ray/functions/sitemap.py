"""sitemaps.org XML parsing — the other half of the crawl-frontier
discovery surface (robots.txt gates, sitemaps propose).

``parse_sitemap`` handles both document kinds: ``<urlset>`` (leaf pages
with optional ``<lastmod>``) and ``<sitemapindex>`` (nested sitemap
references, the sharded layout every large site uses). Namespaces are
stripped structurally (localname match), so the standard
``http://www.sitemaps.org/schemas/sitemap/0.9`` namespace, no-namespace
files, and prefixed variants all parse identically. Malformed XML
returns an empty urlset rather than raising — a crawl pipeline treats a
broken sitemap as "no proposals", not a job failure.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["parse_sitemap"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml_text: str) -> tuple[str, list]:
    """→ ``("urlset", [(loc, lastmod|None), ...])`` or
    ``("index", [child_loc, ...])``; unparseable / unknown-root input →
    ``("urlset", [])``."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return ("urlset", [])
    kind = _local(root.tag)
    if kind == "sitemapindex":
        locs = []
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            for child in sm:
                if _local(child.tag) == "loc" and child.text:
                    locs.append(child.text.strip())
        return ("index", locs)
    if kind != "urlset":
        return ("urlset", [])
    entries = []
    for url_el in root:
        if _local(url_el.tag) != "url":
            continue
        loc, lastmod = None, None
        for child in url_el:
            t = _local(child.tag)
            if t == "loc" and child.text:
                loc = child.text.strip()
            elif t == "lastmod" and child.text:
                lastmod = child.text.strip()
        if loc:
            entries.append((loc, lastmod))
    return ("urlset", entries)
