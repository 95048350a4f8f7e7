"""Compiled regular expressions and constant tables defining the URL
clean/filter semantics.

These patterns are the behavioral *specification* of the engine's
scalar layer; they mirror the reference semantics exactly (see
/root/reference/courlan/clean.py:16-40, filters.py:16-135,
settings.py:7-109, urlutils.py:11-21, core.py:34-36).  Everything
else in ``urlkit`` is a from-scratch implementation around them.
"""

from __future__ import annotations

import re

# --- URL-in-URL repair (clean.py:16-29) -------------------------------
RX_PROTOCOL = re.compile(r"https?://")
RX_DOUBLED_HEAD = re.compile(r'(https?://[^">&? ]+?)(?:https?://)')
RX_DOUBLED_MID = re.compile(r"https?://.+?(https?://.+?)(?:https?://|$)")

RX_PATH_SLASHES = re.compile(r"/+")
RX_PATH_DOTDOT = re.compile(r"^(?:/\.\.(?![^/]))+")

CONTROL_CHARS = "".join(map(chr, range(0x20)))
RX_MARKUP_REST = re.compile(r"</?[a-z]{,4}?>|{.+?}")
RX_TRAILING_AMP = re.compile(r"/\&$")
RX_TRAILING_GARBAGE = re.compile(r'(.*?)[<>"\s]')

# Tracking-parameter names (clean.py:31-40; sources: AdGuard
# TrackParamFilter, ClearURLs rules, Mozilla query-stripping list).
RX_TRACKERS = re.compile(
    r"^(?:dc|fbc|gc|twc|yc|ysc)lid|"
    r"^(?:click|gbra|msclk|igsh|partner|wbra)id|"
    r"^(?:ads?|mc|ga|gs|itm|mkt|ml|mtm|oly|pk|utm|vero)_|"
    r"(?:\b|_)(?:aff|affi|affiliate|campaign|cl?id|eid|ga|gl|"
    r"kwd|keyword|medium|ref|referr?er|session|source|uid|xtor)"
)

# --- host validation (filters.py:16-54) --------------------------------
PROTOCOLS = {"http", "https"}

IP_CHARS = set(".:0123456789abcdef")

# domain[:port] shape check (cf. python-validators/validators domain.py)
RX_DOMAIN_PORT = re.compile(
    r"^(?:[a-zA-Z0-9]"
    r"(?:[a-zA-Z0-9-_]{0,61}[A-Za-z0-9])?\.)"
    r"+[A-Za-z0-9][A-Za-z0-9-_]{0,61}"
    r"[A-Za-z]"
    r"(\:(6553[0-5]|655[0-2][0-9]|65[0-4][0-9]{2}|"
    r"6[0-4][0-9]{3}|[1-5][0-9]{4}|[1-9][0-9]{0,3}))?$",
    re.IGNORECASE,
)

# --- content-type filters (filters.py:56-105) ---------------------------
RX_SITE_STRUCTURE = re.compile(
    r"/(?:wp-(?:admin|content|includes|json|themes)|"
    r"paged?|seite|search|suche|gall?er[a-z]{1,2}|labels|"
    r"archives|uploads|modules|attachment|oembed)/|"
    r"[/_-](?:tags?|schlagwort|[ck]ategor[a-z]{1,2}|[ck]at|auth?or|user)/[^/]+/?$|"
    r"[^0-9]/[0-9]+/[0-9]+/$|[^0-9]/[0-9]{4}/$",
    re.IGNORECASE,
)
RX_FILE_TYPE = re.compile(
    r"\.(atom|json|css|xml|js|jpg|jpeg|png|svg|gif|tiff|pdf|ogg|mp3|m4a|aac|"
    r"avi|mp4|mov|web[mp]|flv|ico|pls|zip|tar|gz|iso|swf|woff|eot|ttf)\b|"
    r"[/-](img|jpg|png)(\b|_)",
    re.IGNORECASE,
)
RX_ADULT_VIDEO = re.compile(
    r"[/_-](?:bild-?kontakte|fick|gangbang|incest|live-?cams?|live-?chat|"
    r"porno?|sexcam|sexyeroti[ck]|swinger|x{3})\b",
    re.IGNORECASE,
)

# --- language cues (filters.py:80-90) -----------------------------------
RX_PATH_LANG = re.compile(
    r"(?:https?://[^/]+/)([a-z]{2})([_-][a-z]{2,3})?(?:/|$)", re.IGNORECASE
)
RX_ALL_PATH_LANGS = re.compile(r"(?:/)([a-z]{2})([_-][a-z]{2})?(?:/)", re.IGNORECASE)
RX_ALL_PATH_LANGS_NT = re.compile(
    r"(?:/)([a-z]{2})([_-][a-z]{2})?(?:/|$)", re.IGNORECASE
)
RX_HOST_LANG = re.compile(
    r"https?://([a-z]{2})\.(?:[^.]{4,})\.(?:[^.]+)(?:\.[^.]+)?/", re.IGNORECASE
)

# --- crawl heuristics (filters.py:92-105) --------------------------------
RX_NAVIGATION = re.compile(
    r"[/_-](archives|auth?or|[ck]at|category|kategorie|paged?|schlagwort|seite|tags?|topics?|user)/|\?p=[0-9]+",
    re.IGNORECASE,
)
RX_NOT_CRAWLABLE = re.compile(
    r"/([ck]onta[ck]t|datenschutzerkl.{1,2}rung|login|impressum|imprint)(\.[a-z]{3,4})?/?$|/login\?|"
    r"/(javascript:|mailto:|tel\.?:|whatsapp:)",
    re.IGNORECASE,
)
RX_INDEX_PAGE = re.compile(
    r".{0,5}/(default|home|index)(\.[a-z]{3,5})?/?$", re.IGNORECASE
)

# --- document extensions (filters.py:107-135) ----------------------------
RX_PATH_EXTENSION = re.compile(r"\.[a-z]{2,5}$")
WHITELISTED_EXTENSIONS = frozenset(
    (
        ".adp", ".amp", ".asp", ".aspx", ".cfm", ".cgi", ".do", ".htm",
        ".html", ".htx", ".jsp", ".mht", ".mhtml", ".php", ".php3",
        ".php4", ".php5", ".phtml", ".pl", ".shtml", ".stm", ".txt",
        ".xhtml", ".xml",
    )
)

# --- registrable-domain fast path (urlutils.py:11-21) ---------------------
RX_DOMAIN_FAST = re.compile(
    r"(?:(?:f|ht)tp)s?://"
    r"(?:[^/?#]{,63}\.)?"
    r"([^/?#.]{4,63}\.[^/?#]{2,63}|"
    r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}|"
    r"[0-9a-f:]{16,})"
    r"(?:/|$)"
)
RX_STRIP_PORT = re.compile(r"(?<=\D):\d+")
RX_WWW_PREFIX = re.compile(r"^www[0-9]*\.")
RX_FEED_WHITELIST = re.compile(r"(?:feed(?:burner|proxy))", re.I)

# --- HTML link extraction (core.py:34-36) ---------------------------------
RX_ANCHOR_TAG = re.compile(r"<a\s+[^<>]+?>", re.I)
RX_HREFLANG = re.compile(r'hreflang=["\']?([a-z-]+)', re.I)
RX_HREF = re.compile(r'href=["\']?([^ ]+?)(["\' >])', re.I)

# --- constant tables (settings.py:7-109) -----------------------------------
DOMAIN_BLACKLIST = frozenset(
    (
        "360", "akamai", "aliexpress", "amzn", "amazon", "amazonaws",
        "baidu", "bit", "bongacams", "chaturbate", "cloudfront",
        "daftsex", "delicious", "digg", "ebay", "ebay-kleinanzeigen",
        "facebook", "feedburner", "flickr", "gettyimages", "gmx",
        "google", "gravatar", "http", "imgur", "immobilienscout24",
        "instagr", "instagram", "jd", "last", "linkedin", "live",
        "livejasmin", "localhost", "mail", "naver", "netflix", "office",
        "ok", "onlyfans", "otto", "paypal", "pinterest", "pornhub",
        "postbank", "qq", "reddit", "redtube", "sina", "sohu",
        "soundcloud", "spankbang", "taobao", "telegram", "tiktok",
        "tmall", "tnaflix", "twitch", "twitter", "twitpic", "txxx",
        "vk", "vkontakte", "vimeo", "web", "weibo", "whatsapp",
        "xhamster", "xnxx", "xvideos", "yahoo", "yandex", "youjizz",
        "youporn", "youtube", "youtu", "zoom",
    )
)

ALLOWED_PARAMS = frozenset(
    (
        "aid", "article_id", "artnr", "id", "itemid", "objectid", "p",
        "page", "pagenum", "page_id", "pid", "post", "postid",
        "product_id",
    )
)

LANG_PARAMS = frozenset(("lang", "language"))

TARGET_LANG_VALUES = {
    "de": frozenset(("de", "deutsch", "ger", "german")),
    "en": frozenset(("en", "english", "eng")),
}
