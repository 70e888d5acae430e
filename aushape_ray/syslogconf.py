"""Syslog facility/priority name tables (S4 config parity —
/root/reference/lib/syslog_misc.c:27-50, which walks the platform's
``facilitynames`` / ``prioritynames`` arrays from <syslog.h> with a
case-insensitive match and returns -1 for unknown names).

The numeric values are the standard BSD/glibc syslog constants (public,
RFC 3164): facilities are pre-shifted (<<3), so a message's PRI value is
``facility + priority``.  Ported as explicit tables so behavior is
platform-stable."""

from __future__ import annotations

FACILITIES: dict[str, int] = {
    "kern": 0, "user": 8, "mail": 16, "daemon": 24, "auth": 32,
    "security": 32,  # deprecated alias for auth (glibc table)
    "syslog": 40, "lpr": 48, "news": 56, "uucp": 64, "cron": 72,
    "authpriv": 80, "ftp": 88,
    "local0": 128, "local1": 136, "local2": 144, "local3": 152,
    "local4": 160, "local5": 168, "local6": 176, "local7": 184,
}

PRIORITIES: dict[str, int] = {
    "emerg": 0, "panic": 0,      # panic: deprecated alias
    "alert": 1, "crit": 2,
    "err": 3, "error": 3,        # error: deprecated alias
    "warning": 4, "warn": 4,     # warn: deprecated alias
    "notice": 5, "info": 6, "debug": 7,
}


def facility_from_str(name: str) -> int:
    """Case-insensitive facility lookup; -1 for unknown (the reference's
    aushape_syslog_facility_from_str contract)."""
    return FACILITIES.get((name or "").lower(), -1)


def priority_from_str(name: str) -> int:
    return PRIORITIES.get((name or "").lower(), -1)


def pri_value(facility: str, priority: str) -> int:
    """RFC 3164 PRI = facility + priority; raises on unknown names the
    way conf loading fails in the reference (lib/conf.c:352-374)."""
    f = facility_from_str(facility)
    p = priority_from_str(priority)
    if f < 0:
        raise ValueError(f"unknown syslog facility: {facility!r}")
    if p < 0:
        raise ValueError(f"unknown syslog priority: {priority!r}")
    return f + p
