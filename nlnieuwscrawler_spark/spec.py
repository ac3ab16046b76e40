"""THE pinned behavioral spec shared by engine, fixture generator, and oracle.

The reference (``RoelvandenBerg/nlnieuwscrawler``) mount was empty this
session (SURVEY.md §0), so the contractual behaviors from BASELINE.json
north_star/north_rule are pinned HERE, once, and three independent
implementations follow it:

1. the Spark engine (native exprs + pandas UDFs),
2. the deterministic fixture generator (golden columns),
3. the pure-Python oracle crawler (tests/oracle equivalence).

Any change to these constants is a spec change and must update all three.
"""

from __future__ import annotations

# --- URL canonicalization -------------------------------------------------
# Schemes we refuse to enqueue (reference validate-module behavior).
REJECT_SCHEME_RE = r"^(?i:mailto|javascript|tel|data|ftp|file|about):"
# Non-article resource extensions rejected from the frontier.
MEDIA_EXTENSIONS = (
    "jpg jpeg png gif webp bmp svg ico css js mjs json pdf doc docx xls xlsx "
    "ppt pptx zip rar gz tgz tar 7z mp3 mp4 m4a m4v avi mov wmv flv ogg ogv "
    "webm wav woff woff2 ttf otf eot exe dmg iso bin apk rss atom"
).split()
MEDIA_EXT_RE = r"(?i)\.(" + "|".join(MEDIA_EXTENSIONS) + r")$"
ACCEPTED_SCHEMES = ("http", "https")
DEFAULT_PORTS = {"http": "80", "https": "443"}

# --- Fingerprinting --------------------------------------------------------
# 64-bit URL fingerprint built from two Spark Murmur3-x86-32 hashes
# (F.hash seed=42 over the canonical URL string, and over the string with
# FP_SALT as a PREFIX), per north_star "MurmurHash3-fingerprints".
# The salt MUST stay a prefix: Murmur3's finalizer is a bijection of
# (state XOR len), so appending a common SUFFIX to two same-length colliding
# strings collides the second half with probability 1 — a suffix-salted
# fingerprint degrades to effectively 32 bits for same-length URLs
# (9 measured 64-bit collisions per 10^6 URLs). See
# functions/urls.py:url_fingerprint for the full collision analysis.
FP_SALT = "\x00fp2"
# Version stamp of the whole fingerprint function (algorithm, seed, salt
# value AND position). Every SnapshotStore manifest records it at commit
# time and Crawl.resume() refuses a snapshot written under a different
# stamp: seen_keys / frontier / lineage buckets are keyed by url_fp, so
# resuming across a fingerprint change would silently re-admit
# already-crawled URLs. Bump this string on ANY change to url_fingerprint.
FINGERPRINT_SPEC = "murmur3x32x2/seed42/prefix-salt:" + FP_SALT.encode().hex()

# --- Politeness / scheduling ----------------------------------------------
EPOCH_SECONDS = 30.0        # discrete epoch length (reference sleep-loop proxy)
DEFAULT_CRAWL_DELAY = 1.0   # when robots.txt gives no Crawl-delay
USER_AGENT = "nlnieuwscrawler"
MAX_DEPTH = 6               # frontier depth cap

# Per-host fetch budget for one epoch.
def host_budget(crawl_delay: float | None) -> int:
    d = crawl_delay if crawl_delay and crawl_delay > 0 else DEFAULT_CRAWL_DELAY
    return max(1, int(EPOCH_SECONDS / d))


# --- Language gate ---------------------------------------------------------
ACCEPT_LANG = "nl"  # keep page if corpus lang == 'nl', or (null corpus lang
#                     and extracted html-lang == 'nl')

# --- Seed list (reference base-URL list shape, FIXTURES.md A2) --------------
SEED_HOSTS = [
    "nu.nl",
    "nos.nl",
    "telegraaf.nl",
    "volkskrant.nl",
    "nrc.nl",
    "ad.nl",
    "rtlnieuws.nl",
    "trouw.nl",
]
SEED_URLS = [f"https://{h}/" for h in SEED_HOSTS]
SEED_PRIORITY = 0.0  # seeds are depth 0; priority = -depth

# --- Extraction spec (north_star: lxml/bs4 title-body, byte-identical) ------
# title: text content of the FIRST <title> element, HTML entities unescaped,
#        all whitespace runs collapsed to single spaces, stripped.
# text:  '\n\n'-joined text contents of each top-level <p> element in document
#        order; same entity/whitespace normalization per paragraph; empty
#        paragraphs dropped. Nested inline tags contribute their text.
# links: raw href attribute values of <a> elements, document order,
#        dropping None; NOT canonicalized here (that's the O2 stage).
# lang:  lang attribute of the <html> element, lowercased, first 2 chars,
#        None when absent.
# encoding: charset from a meta tag within the first 2048 bytes
#        (content="...charset=X" or charset="X"), supported {utf-8,
#        iso-8859-1, latin-1, windows-1252, ascii}; else utf-8; decode
#        errors='replace'.
EXTRACT_META_SCAN_BYTES = 2048
