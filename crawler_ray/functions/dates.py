"""Date detection for date-indexed record discovery.

The reference's record-detection experiment (results.html: "Date-detection
success threshold: 0.7", 17/20 positives) scored candidate record xpaths
by the fraction of records whose text contains a date; its ``misc.dates``
dependency is vestigial in the current source (dom.clj:12 requires it,
nothing calls it), so the date grammar here is rebuilt from the page
evidence itself: the labeled corpus spans absolute dates (SMF "December
28, 2013, 10:57:04 AM"; phpBB "Sat Dec 28, 2013"; Jive "Dec 28, 2013
7:43 PM"; 4chan "12/28/13(Sat)22:04"), ISO timestamps, and relative
times (HN "5 hours ago", Topix "2 hr ago", SO "asked 2 mins ago").

Bare 4-digit years deliberately do NOT match (copyright footers,
"©1996-2013" on the negative pages, post counts).
"""
from __future__ import annotations

import re

_MONTHS = (
    "jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|"
    "jul(?:y)?|aug(?:ust)?|sep(?:t(?:ember)?)?|oct(?:ober)?|"
    "nov(?:ember)?|dec(?:ember)?"
)
_UNITS = "sec(?:ond)?s?|min(?:ute)?s?|mins?|hours?|hrs?|days?|weeks?|wks?|months?|years?|yrs?"

DATE_RES: list[re.Pattern] = [
    # "December 28, 2013", "Dec 28 2013", "Dec 28, '13", "Dec 28"
    re.compile(
        rf"\b(?:{_MONTHS})\.?\s+\d{{1,2}}(?:st|nd|rd|th)?(?:\s*,?\s*(?:'\d{{2}}|\d{{4}}))?\b",
        re.I,
    ),
    # "28 December 2013", "28 Dec", "28th of December"
    re.compile(
        rf"\b\d{{1,2}}(?:st|nd|rd|th)?(?:\s+of)?\s+(?:{_MONTHS})\b(?:\s*,?\s*\d{{4}})?",
        re.I,
    ),
    # month + year, no day: "Aug '13" (topix), "May 2013"
    re.compile(rf"\b(?:{_MONTHS})\.?\s+(?:'\d{{2}}|\d{{4}})\b", re.I),
    # numeric: 12/28/2013, 12/28/13, 2013-12-28, 28.12.2013
    re.compile(r"\b\d{1,2}[/.-]\d{1,2}[/.-](?:\d{4}|\d{2})\b"),
    re.compile(r"\b\d{4}-\d{2}-\d{2}\b"),
    # relative: "5 hours ago", "2 hr ago", "a few seconds ago", "an hour ago"
    re.compile(rf"\b(?:\d+|a(?:n)?|a few)\s+(?:{_UNITS})\s+ago\b", re.I),
    # compact relative stamps ("46s ago", "12m ago", "1h ago" — the
    # stack-overflow landing form)
    re.compile(r"\b\d+\s*(?:s|m|h|d|w|mo|y)\s*ago\b", re.I),
    re.compile(r"\b(?:yesterday|today)\b(?:\s+at)?\s+\d{1,2}:\d{2}", re.I),
    # time-of-day next to an am/pm marker ("7:13 pm") — forum row stamps
    re.compile(r"\b\d{1,2}:\d{2}(?::\d{2})?\s*(?:am|pm)\b", re.I),
]

# a cell whose ENTIRE text is a bare elapsed interval ("1 min", "4 hr" —
# the topix last-update column) is a date stamp; the same token inside
# prose ("bake 30 min") is not, so this one is fullmatch-only
_BARE_ELAPSED_RE = re.compile(rf"\s*<?\s*\d+\s*(?:{_UNITS})\s*", re.I)


def contains_date(text: str) -> bool:
    """True iff the text contains at least one date-like token."""
    return any(r.search(text) for r in DATE_RES) or bool(
        _BARE_ELAPSED_RE.fullmatch(text)
    )
