"""Fail if a TLS certificate expires within N days.

Parity with the reference tools/check_tls_expiry.py. Reads the cert from a
PEM file or a live endpoint.

Usage: python tools/check_tls_expiry.py --cert-file server.crt --days 14
       python tools/check_tls_expiry.py --host example.com --port 443 --days 14
"""

from __future__ import annotations

import argparse
import ssl
import socket
import sys
from datetime import datetime, timezone


def _not_after_from_pem(path: str) -> datetime:
    with open(path, "rb") as f:
        pem = f.read()
    der = ssl.PEM_cert_to_DER_cert(pem.decode())
    # stdlib-only parse: use ssl's internal test decoder via a throwaway
    # socketless SSLObject is not possible; shell out to the openssl module
    # of hashlib is not either — use cryptography if present, else a
    # minimal ASN.1 scan for the second UTCTime/GeneralizedTime.
    try:
        from cryptography import x509

        return x509.load_der_x509_certificate(der).not_valid_after_utc
    except ImportError:
        pass
    # minimal DER walk: validity is the first SEQUENCE of two times
    import re

    times = re.findall(rb"\x17\x0d(\d{12}Z)|\x18\x0f(\d{14}Z)", der)
    stamps = []
    for utc, gen in times:
        if utc:
            stamps.append(datetime.strptime(utc.decode(), "%y%m%d%H%M%SZ"))
        elif gen:
            stamps.append(datetime.strptime(gen.decode(), "%Y%m%d%H%M%SZ"))
    if len(stamps) < 2:
        raise ValueError("could not parse certificate validity")
    return stamps[1].replace(tzinfo=timezone.utc)


def _not_after_from_host(host: str, port: int) -> datetime:
    ctx = ssl.create_default_context()
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    with socket.create_connection((host, port), timeout=10) as sock:
        with ctx.wrap_socket(sock, server_hostname=host) as tls:
            der = tls.getpeercert(binary_form=True)
    pem = ssl.DER_cert_to_PEM_cert(der)
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".pem", delete=False) as f:
        f.write(pem)
        tmp = f.name
    try:
        return _not_after_from_pem(tmp)
    finally:
        os.unlink(tmp)


def main() -> None:
    parser = argparse.ArgumentParser(description="TLS certificate expiry check")
    parser.add_argument("--cert-file")
    parser.add_argument("--host")
    parser.add_argument("--port", type=int, default=443)
    parser.add_argument("--days", type=int, default=14)
    args = parser.parse_args()
    if not args.cert_file and not args.host:
        parser.error("--cert-file or --host is required")
    not_after = (
        _not_after_from_pem(args.cert_file)
        if args.cert_file
        else _not_after_from_host(args.host, args.port)
    )
    if not_after.tzinfo is None:
        not_after = not_after.replace(tzinfo=timezone.utc)
    remaining = not_after - datetime.now(timezone.utc)
    print(f"certificate expires {not_after.isoformat()} ({remaining.days} days)")
    if remaining.days < args.days:
        print(f"FAIL: less than {args.days} days remaining", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
