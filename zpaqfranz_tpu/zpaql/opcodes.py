"""ZPAQL instruction set tables.

Encoding (ZPAQ L2 spec; see the opcode map documented at
/root/reference/ZSFX/libzpaq.cpp:2742-2807):

  00dddxxx  unary op xxx on destination ddd (ddd < 7)
  00111xxx  special instruction xxx
  01dddsss  assignment ddd = sss
  1xxxxsss  binary operation xxxx from sss into A

ddd/sss: 0=A 1=B 2=C 3=D 4=*B 5=*C 6=*D 7=immediate-operand.
Opcodes with low 3 bits == 7 carry a second operand byte; LJ (255) carries two.
"""

# Index == opcode byte value.  Empty string == invalid opcode.
OPCODELIST = [
    "error", "a++", "a--", "a!", "a=0", "", "", "a=r",
    "b<>a", "b++", "b--", "b!", "b=0", "", "", "b=r",
    "c<>a", "c++", "c--", "c!", "c=0", "", "", "c=r",
    "d<>a", "d++", "d--", "d!", "d=0", "", "", "d=r",
    "*b<>a", "*b++", "*b--", "*b!", "*b=0", "", "", "jt",
    "*c<>a", "*c++", "*c--", "*c!", "*c=0", "", "", "jf",
    "*d<>a", "*d++", "*d--", "*d!", "*d=0", "", "", "r=a",
    "halt", "out", "", "hash", "hashd", "", "", "jmp",
    "a=a", "a=b", "a=c", "a=d", "a=*b", "a=*c", "a=*d", "a=",
    "b=a", "b=b", "b=c", "b=d", "b=*b", "b=*c", "b=*d", "b=",
    "c=a", "c=b", "c=c", "c=d", "c=*b", "c=*c", "c=*d", "c=",
    "d=a", "d=b", "d=c", "d=d", "d=*b", "d=*c", "d=*d", "d=",
    "*b=a", "*b=b", "*b=c", "*b=d", "*b=*b", "*b=*c", "*b=*d", "*b=",
    "*c=a", "*c=b", "*c=c", "*c=d", "*c=*b", "*c=*c", "*c=*d", "*c=",
    "*d=a", "*d=b", "*d=c", "*d=d", "*d=*b", "*d=*c", "*d=*d", "*d=",
    "", "", "", "", "", "", "", "",
    "a+=a", "a+=b", "a+=c", "a+=d", "a+=*b", "a+=*c", "a+=*d", "a+=",
    "a-=a", "a-=b", "a-=c", "a-=d", "a-=*b", "a-=*c", "a-=*d", "a-=",
    "a*=a", "a*=b", "a*=c", "a*=d", "a*=*b", "a*=*c", "a*=*d", "a*=",
    "a/=a", "a/=b", "a/=c", "a/=d", "a/=*b", "a/=*c", "a/=*d", "a/=",
    "a%=a", "a%=b", "a%=c", "a%=d", "a%=*b", "a%=*c", "a%=*d", "a%=",
    "a&=a", "a&=b", "a&=c", "a&=d", "a&=*b", "a&=*c", "a&=*d", "a&=",
    "a&~a", "a&~b", "a&~c", "a&~d", "a&~*b", "a&~*c", "a&~*d", "a&~",
    "a|=a", "a|=b", "a|=c", "a|=d", "a|=*b", "a|=*c", "a|=*d", "a|=",
    "a^=a", "a^=b", "a^=c", "a^=d", "a^=*b", "a^=*c", "a^=*d", "a^=",
    "a<<=a", "a<<=b", "a<<=c", "a<<=d", "a<<=*b", "a<<=*c", "a<<=*d", "a<<=",
    "a>>=a", "a>>=b", "a>>=c", "a>>=d", "a>>=*b", "a>>=*c", "a>>=*d", "a>>=",
    "a==a", "a==b", "a==c", "a==d", "a==*b", "a==*c", "a==*d", "a==",
    "a<a", "a<b", "a<c", "a<d", "a<*b", "a<*c", "a<*d", "a<",
    "a>a", "a>b", "a>c", "a>d", "a>*b", "a>*c", "a>*d", "a>",
    "", "", "", "", "", "", "", "",
    "", "", "", "", "", "", "", "lj",
]
assert len(OPCODELIST) == 256

# structured-control pseudo tokens accepted by the compiler after the opcodes
PSEUDO = [
    "post", "pcomp", "end", "if", "ifnot", "else", "endif", "do",
    "while", "until", "forever", "ifl", "ifnotl", "elsel", ";",
]

OP_JT, OP_JF, OP_R_EQ_A, OP_HALT, OP_OUT, OP_JMP, OP_LJ = 39, 47, 55, 56, 57, 63, 255

OPCODE = {name: i for i, name in enumerate(OPCODELIST) if name}


def has_operand(op: int) -> bool:
    """True if the opcode carries a one-byte operand (low 3 bits all set)."""
    return (op & 7) == 7


def disassemble(code: bytes) -> list:
    """Decode a HCOMP/PCOMP byte string into [(pc, text)] for debugging."""
    out = []
    i = 0
    while i < len(code):
        op = code[i]
        name = OPCODELIST[op] or "???"
        if op == OP_LJ and i + 2 < len(code):
            out.append((i, f"lj {code[i + 1] + 256 * code[i + 2]}"))
            i += 3
        elif has_operand(op) and i + 1 < len(code):
            arg = code[i + 1]
            if op in (OP_JT, OP_JF, OP_JMP):
                arg = ((arg + 128) & 255) - 128
            out.append((i, f"{name} {arg}"))
            i += 2
        else:
            out.append((i, name))
            i += 1
    return out
