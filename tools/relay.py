#!/usr/bin/env python3
"""HTTP -> WebSocket/TCP relay for live MPEG-TS streaming.

The sidecar role of the reference's websocket-relay.js: an encoder (e.g.
ffmpeg on another machine) POSTs an endless MPEG-TS body to
http://host:8081/<secret>, and every connected WebSocket client on :8082
(plus raw-TCP clients on :8083, which the TCPSource speaks) receives each
chunk as it arrives.  Optional recording to a .ts file.

  python tools/relay.py <secret> [--http 8081] [--ws 8082] [--tcp 8083]
                        [--record out.ts]

stdlib only (asyncio); WebSocket framing from jsmpeg_tpu.net.ws.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from jsmpeg_tpu.net.ws import encode_frame, server_handshake  # noqa: E402


class Relay:
    def __init__(self, secret: str, record: str | None = None):
        self.secret = secret
        self.ws_clients: set[asyncio.StreamWriter] = set()
        self.tcp_clients: set[asyncio.StreamWriter] = set()
        self.http_clients: set[asyncio.StreamWriter] = set()
        self.record = open(record, 'ab') if record else None
        self.bytes_in = 0

    def broadcast(self, chunk: bytes) -> None:
        self.bytes_in += len(chunk)
        if self.record:
            self.record.write(chunk)
        ws_frame = encode_frame(chunk, opcode=0x2)
        for w in list(self.ws_clients):
            try:
                w.write(ws_frame)
            except Exception:
                self.ws_clients.discard(w)
        for w in list(self.tcp_clients):
            try:
                w.write(chunk)
            except Exception:
                self.tcp_clients.discard(w)
        hx = b'%x\r\n%s\r\n' % (len(chunk), chunk)   # chunked framing
        for w in list(self.http_clients):
            try:
                w.write(hx)
            except Exception:
                self.http_clients.discard(w)

    # ---------------------------------------------------------- HTTP in/out

    async def handle_http(self, reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter) -> None:
        """POST /<secret> ingests; GET streams the live TS back out as an
        endless chunked body (no Content-Length -- the HTTPStreamSource /
        reference-Fetch shape of delivery)."""
        try:
            head = await reader.readuntil(b'\r\n\r\n')
        except (asyncio.IncompleteReadError, asyncio.LimitOverrunError):
            writer.close()
            return
        request = head.split(b'\r\n')[0].decode('latin1')
        parts = request.split(' ')
        method = parts[0].upper() if parts else 'GET'
        path = parts[1] if len(parts) > 1 else '/'
        if method == 'GET':
            await self._serve_http_out(reader, writer)
            return
        if path.strip('/') != self.secret:
            writer.write(b'HTTP/1.1 403 Forbidden\r\n\r\n')
            await writer.drain()
            writer.close()
            return
        peer = writer.get_extra_info('peername')
        print(f'relay: stream connected from {peer}', flush=True)
        try:
            while True:
                chunk = await reader.read(65536)
                if not chunk:
                    break
                self.broadcast(chunk)
        finally:
            print('relay: stream disconnected', flush=True)
            writer.close()

    async def _serve_http_out(self, reader: asyncio.StreamReader,
                              writer: asyncio.StreamWriter) -> None:
        writer.write(b'HTTP/1.1 200 OK\r\n'
                     b'Content-Type: video/mp2t\r\n'
                     b'Transfer-Encoding: chunked\r\n'
                     b'Cache-Control: no-store\r\n'
                     b'Connection: close\r\n\r\n')
        await writer.drain()
        self.http_clients.add(writer)
        print(f'relay: http client connected '
              f'({len(self.http_clients)} total)', flush=True)
        try:
            while True:
                data = await reader.read(4096)
                if not data:
                    break
        finally:
            self.http_clients.discard(writer)
            writer.close()
            print('relay: http client disconnected', flush=True)

    # -------------------------------------------------------------- WS out

    async def handle_ws(self, reader: asyncio.StreamReader,
                        writer: asyncio.StreamWriter) -> None:
        try:
            head = await reader.readuntil(b'\r\n\r\n')
        except (asyncio.IncompleteReadError, asyncio.LimitOverrunError):
            writer.close()
            return
        resp = server_handshake(head)
        if resp is None:
            writer.write(b'HTTP/1.1 400 Bad Request\r\n\r\n')
            await writer.drain()
            writer.close()
            return
        writer.write(resp)
        await writer.drain()
        self.ws_clients.add(writer)
        print(f'relay: ws client connected '
              f'({len(self.ws_clients)} total)', flush=True)
        try:
            while True:
                data = await reader.read(4096)
                if not data:
                    break   # ignore client frames; connection close ends us
        finally:
            self.ws_clients.discard(writer)
            writer.close()
            print('relay: ws client disconnected', flush=True)

    # ------------------------------------------------------------- TCP out

    async def handle_tcp(self, reader: asyncio.StreamReader,
                         writer: asyncio.StreamWriter) -> None:
        self.tcp_clients.add(writer)
        print(f'relay: tcp client connected '
              f'({len(self.tcp_clients)} total)', flush=True)
        try:
            while True:
                data = await reader.read(4096)
                if not data:
                    break
        finally:
            self.tcp_clients.discard(writer)
            writer.close()
            print('relay: tcp client disconnected', flush=True)


async def serve(secret: str, http_port: int, ws_port: int, tcp_port: int,
                record: str | None, host: str = '0.0.0.0') -> None:
    relay = Relay(secret, record)
    http_srv = await asyncio.start_server(relay.handle_http, host, http_port)
    ws_srv = await asyncio.start_server(relay.handle_ws, host, ws_port)
    tcp_srv = await asyncio.start_server(relay.handle_tcp, host, tcp_port)
    print(f'relay: ingest http://{host}:{http_port}/{secret}  '
          f'clients ws://{host}:{ws_port}/ tcp://{host}:{tcp_port}',
          flush=True)
    async with http_srv, ws_srv, tcp_srv:
        await asyncio.gather(http_srv.serve_forever(),
                             ws_srv.serve_forever(),
                             tcp_srv.serve_forever())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('secret')
    ap.add_argument('--http', type=int, default=8081)
    ap.add_argument('--ws', type=int, default=8082)
    ap.add_argument('--tcp', type=int, default=8083)
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--record')
    args = ap.parse_args()
    asyncio.run(serve(args.secret, args.http, args.ws, args.tcp,
                      args.record, args.host))


if __name__ == '__main__':
    main()
