"""Effect host + builtin filters (reference L4, src/effects-weed.c)."""

from .host import (ChannelTemplate, Filter, FrameContext, Instance, Param,
                   apply_chain, apply_instance, get_filter, instantiate,
                   list_filters, register_filter)
