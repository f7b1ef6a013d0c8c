"""External control plane: OSC server + notify sockets (reference L10)."""

from .protocol import OSCMessage, build_message, parse_packet
from .server import OSCServer, NOTIFY
