"""Run-outcome notification — the reference emails a run report on
pipeline completion/failure (reference: scripts/ETL Pipeline/config/
email.py:23-60, wired from the pipeline drivers).

Split transport from content so the sandbox-honest part (formatting the
audit row into a report, building the MIME message) is fully tested, and
only the SMTP send — pure stdlib smtplib, nothing to test without a
broker — happens at the edge. A transport is any ``(subject, body) ->
None`` callable, so tests and alternative sinks (Slack webhook, pager)
plug in without touching callers.
"""

from __future__ import annotations

import smtplib
from collections.abc import Callable, Mapping
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any

Transport = Callable[[str, str], None]

# Audit-row fields rendered in order (M3 advance_watermark / pipelines
# audit schema); unknown extra fields append after these.
_REPORT_FIELDS = (
    "source",
    "row_count",
    "start_time",
    "end_time",
    "last_extract_dt",
    "success",
    "status",
    "error_message",
)


def format_run_report(run: Mapping[str, Any]) -> tuple[str, str]:
    """(subject, html body) for one audit row — the reference's email
    content, minus its hardcoded SMTP coupling.

    Every interpolated value is HTML-escaped: ``error_message`` carries
    upstream exception text verbatim, and unescaped markup there would
    corrupt (or inject into) the rendered report."""
    import html

    ok = bool(run.get("success", False))
    source = run.get("source", "unknown-source")
    subject = f"[ssg-etl] {'SUCCESS' if ok else 'FAILURE'}: {source}"
    keys = [k for k in _REPORT_FIELDS if k in run]
    keys += [k for k in run if k not in _REPORT_FIELDS]
    rows = "".join(
        f"<tr><td>{html.escape(str(k))}</td>"
        f"<td>{html.escape(str(run[k]))}</td></tr>"
        for k in keys
    )
    body = (
        f"<h3>{html.escape(subject)}</h3>"
        f"<table border='1' cellpadding='4'>{rows}</table>"
    )
    return subject, body


def notify_run(run: Mapping[str, Any], transport: Transport,
               only_failures: bool = False) -> bool:
    """Send the run report through ``transport``; returns whether a
    notification went out (False when suppressed by ``only_failures``)."""
    if only_failures and bool(run.get("success", False)):
        return False
    subject, body = format_run_report(run)
    transport(subject, body)
    return True


def smtp_transport(
    host: str,
    port: int,
    sender: str,
    to: list[str],
    password: str | None = None,
    use_tls: bool = True,
) -> Transport:
    """Real SMTP edge (stdlib; reference parity). Builds the same
    MIME shape as the reference's send_mail; untestable in-sandbox —
    everything above this function is."""

    def send(subject: str, body: str) -> None:
        msg = MIMEMultipart()
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(to)
        msg.attach(MIMEText(body, "html"))
        with smtplib.SMTP(host, port) as s:
            if use_tls:
                s.starttls()
            if password is not None:
                s.login(sender, password)
            s.sendmail(sender, to, msg.as_string())

    return send
