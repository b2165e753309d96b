from .memory_gadget import BufferReaderGadget
from .call_gadget import CallGadget
from .precompile_gadget import PrecompileGadget
